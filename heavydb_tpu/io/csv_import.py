"""CSV/Parquet import (reference ImportExport/Importer.h:808 delimited +
parquet paths).  Round 1 rides pandas/pyarrow C parsers for the parse stage;
conversion to physical columns goes through storage.to_physical."""

from __future__ import annotations

from typing import Dict

import numpy as np

from heavydb_tpu.errors import StorageError
from heavydb_tpu.storage.table import Table, to_physical


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
