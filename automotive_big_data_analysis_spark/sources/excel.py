"""Excel ingest (reference op S4: ``POST /api/v1/upload/excel``,
``backend/app.py:174-249``).

The reference saves the upload, reads it with ``pandas.read_excel``,
renames frontend→db columns via the reverse mapping, whitelists
pass-through columns, and bulk-inserts. Here the same contract becomes:
pandas (driver-side — uploads are human-scale) → ``createDataFrame`` with
the authoritative schema → DataFrame append. Excel parsing needs an engine
(openpyxl/xlrd), which this environment may not ship — the parse step is
behind an import-try, and the row-dict path is directly testable without
a real ``.xlsx`` file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from automotive_big_data_analysis_spark.catalog import (
    CAR_FIELD_MAPPING,
    UPLOAD_PASSTHROUGH_COLUMNS,
    car_data_from_rows,
)

# frontend name → db name (reference backend/app.py:29)
REVERSE_MAPPING = {api: db for db, api in CAR_FIELD_MAPPING.items()}

ALLOWED_EXTENSIONS = (".xls", ".xlsx")


class ExcelIngestError(ValueError):
    """Invalid upload (bad extension, empty sheet, unparseable file)."""


def rows_from_excel(path: str) -> list[dict]:
    """Parse an Excel file to row dicts. Raises ExcelIngestError on the
    same conditions the reference rejects (extension, empty, corrupt)."""
    if not path.lower().endswith(ALLOWED_EXTENSIONS):
        raise ExcelIngestError(f"unsupported file extension: {os.path.basename(path)}")
    try:
        import pandas as pd

        pdf = pd.read_excel(path)
    except ImportError as exc:  # pragma: no cover - env without excel engine
        raise ExcelIngestError(f"no Excel engine available: {exc}") from exc
    except Exception as exc:
        raise ExcelIngestError(f"cannot parse Excel file: {exc}") from exc
    if pdf.empty:
        raise ExcelIngestError("empty sheet")
    return pdf.to_dict("records")


def normalize_upload_rows(rows: list[dict]) -> list[dict]:
    """Apply the reverse field mapping + pass-through whitelist (reference
    ``backend/app.py:207-226``): frontend-named columns are renamed to db
    names, whitelisted db-named columns pass through, anything else is
    silently discarded."""
    out = []
    for row in rows:
        mapped = {}
        for key, value in row.items():
            if key in REVERSE_MAPPING:
                mapped[REVERSE_MAPPING[key]] = value
            elif key in UPLOAD_PASSTHROUGH_COLUMNS:
                mapped[key] = value
        out.append(mapped)
    return out


def ingest_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Upload rows → typed car_data DataFrame ready to append."""
    return car_data_from_rows(spark, normalize_upload_rows(rows))


def ingest_excel(spark: SparkSession, path: str) -> DataFrame:
    return ingest_rows(spark, rows_from_excel(path))
