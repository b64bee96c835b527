from . import csv_source  # noqa: F401
