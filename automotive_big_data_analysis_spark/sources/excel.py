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


def save_upload(content: bytes, original_filename: str, upload_dir: str) -> str:
    """Persist an uploaded file under a UUID name (reference
    ``backend/app.py:189-193``): collision-proof, keeps the original
    extension so the parser can dispatch on it. Extension is validated
    BEFORE anything touches disk, same as the reference."""
    import uuid

    if not original_filename or not original_filename.lower().endswith(
        ALLOWED_EXTENSIONS
    ):
        raise ExcelIngestError(
            f"unsupported file extension: {os.path.basename(original_filename or '')}"
        )
    os.makedirs(upload_dir, exist_ok=True)
    ext = os.path.splitext(original_filename)[1]
    path = os.path.join(upload_dir, uuid.uuid4().hex + ext)
    with open(path, "wb") as fh:
        fh.write(content)
    return path


def ingest_upload(
    spark: SparkSession,
    content: bytes,
    original_filename: str,
    upload_dir: str,
    parser=rows_from_excel,
) -> DataFrame:
    """Full upload lifecycle (reference ``backend/app.py:174-249``):
    save under a UUID name → parse → rename/whitelist → typed DataFrame;
    the saved file is removed in ``finally`` (reference ``:243-246``)
    whether the parse succeeds or raises.

    ``parser`` is injectable because this container has no Excel engine —
    production uses the default ``rows_from_excel``; tests (and callers
    ingesting pre-parsed payloads) pass a ``path -> list[dict]``."""
    path = save_upload(content, original_filename, upload_dir)
    try:
        return ingest_rows(spark, parser(path))
    finally:
        if os.path.exists(path):
            os.remove(path)
