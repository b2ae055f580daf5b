"""``python -m solar_logger_spark`` — see :mod:`solar_logger_spark.cli`."""

from solar_logger_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
