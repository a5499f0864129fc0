"""Arrow-vectorized transcript-turn normalization (north-star: pandas UDFs
for row decode/normalization, no per-row Python).

The reference renders every decoded value to a canonical string
(``RowParser.java:171-369``); our analog is canonicalizing turn text before it
lands in the table: Unicode NFC, control characters stripped, internal
whitespace collapsed, outer whitespace trimmed. One Arrow batch in, one out —
every step is a pandas ``.str`` method (C-level loops), no Python per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

_CTRL = dict.fromkeys(
    c for c in range(0x20) if chr(c) not in ("\t", "\n")
)


@F.pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    out = s.str.normalize("NFC").str.translate(_CTRL)
    return out.str.replace(r"[ \t]+", " ", regex=True).str.strip()
