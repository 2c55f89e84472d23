"""CSV/Parquet import (reference ImportExport/Importer.h:808 delimited +
parquet paths).  Round 1 rides pandas/pyarrow C parsers for the parse stage;
conversion to physical columns goes through storage.to_physical."""

from __future__ import annotations

from typing import Dict

import numpy as np

from heavydb_tpu.errors import StorageError
from heavydb_tpu.storage.table import Table, to_physical


def detect_column_types(path: str, options: Dict = None) -> list:
    """Infer (name, TypeInfo) schema from a CSV/Parquet sample — the role of
    the reference's import Detector (ImportExport/Importer.h:753,
    detect_column_types Thrift endpoint)."""
    import pandas as pd

    from heavydb_tpu import types as T

    options = options or {}
    header = options.get("header", True)
    if isinstance(header, str):
        header = header.lower() in ("true", "1", "yes")
    if path.endswith(".parquet"):
        df = pd.read_parquet(path)
    else:
        df = pd.read_csv(
            path, sep=options.get("delimiter", ","),
            header=0 if header else None, nrows=10_000,
            na_values=[r"\N", "NULL", ""],
        )
    out = []
    for c in df.columns:
        s = df[c]
        k = s.dtype.kind
        if k == "b":
            ti = T.boolean()
        elif k == "i":
            mx = s.abs().max() if len(s) else 0
            ti = T.bigint() if mx >= 2**31 else T.integer()
        elif k == "f":
            # integers-with-nulls parse as float; detect
            nn = s.dropna()
            if len(nn) and (nn == nn.round()).all() and nn.abs().max() < 2**53:
                ti = T.bigint() if nn.abs().max() >= 2**31 else T.integer()
                ti = ti.with_nullable(True)
            else:
                ti = T.double()
        elif k == "M":
            ti = T.timestamp()
        else:
            # try dates then fall back to TEXT
            nn = s.dropna().astype(str).head(100)
            try:
                import datetime as _dt

                for v in nn:
                    _dt.date.fromisoformat(v.strip())
                ti = T.date()
            except Exception:
                ti = T.text_dict()
        name = str(c) if header or path.endswith(".parquet") else f"col_{c}"
        out.append((name, ti))
    return out


def import_csv(t: Table, path: str, options: Dict) -> int:
    import pandas as pd

    if path.endswith(".parquet"):
        df = pd.read_parquet(path)
    else:
        header = options.get("header", True)
        if isinstance(header, str):
            header = header.lower() in ("true", "1", "yes")
        delim = options.get("delimiter", ",")
        quote = options.get("quote", '"')
        df = pd.read_csv(
            path,
            sep=delim,
            header=0 if header else None,
            quotechar=quote,
            na_values=[r"\N", "NULL", ""],
            keep_default_na=True,
            skipinitialspace=True,
        )
    if len(df.columns) != len(t.columns):
        raise StorageError(
            f"CSV has {len(df.columns)} columns, table {t.name} has {len(t.columns)}"
        )
    arrays = {}
    for cd, csv_col in zip(t.columns, df.columns):
        series = df[csv_col]
        vals = series.to_numpy()
        if vals.dtype.kind == "O" or cd.type.is_dict_string or cd.type.is_time:
            vals = [None if (v is None or (isinstance(v, float) and v != v)) else v
                    for v in series.tolist()]
        arrays[cd.col_id] = to_physical(vals, cd.type, t.dicts.get(cd.col_id))
    n = len(df)
    if n:
        t.insert_columns(arrays)
    return n
