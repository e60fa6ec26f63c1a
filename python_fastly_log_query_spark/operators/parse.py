"""Vectorized grok parser for Fastly-style syslog lines.

Implements the exact parse semantics of the reference parser
(reference src/parse/log_parser.py:20-186) as ONE Arrow-batched
``mapInPandas`` stage — no per-row Python UDFs.  Python ``re`` is kept
deliberately (never translated to Java regex) so extraction is
byte-identical with the reference (SURVEY.md §7 "What's hard").

Semantics contract (all verified by golden-parity tests against the
reference's own ``parse_log_line``):

- strict 16-group full-line pattern, anchored ``match`` (ref :20-35, :72);
  on match ALL fields come from the fast path;
- otherwise independent per-field fallback probes (ref :111-186);
- empty regex groups become NULL (``safe_get`` falsiness, ref :45-50);
- ``safe_int`` → NULL on invalid (ref :38-43);
- timestamps parse strictly as ``%Y-%m-%dT%H:%M:%SZ`` → naive UTC
  (ref :76-82, :113-119);
- ``path``/``query_string`` split on first ``?``; query params split on
  ``&``, only ``key=value`` pairs kept (bare keys dropped from the map but
  kept in ``query_string``), value split on FIRST ``=``, duplicate keys:
  last wins (ref :92-102);
- fallback UA requires the substring ``Mozilla`` (ref :161-168); fallback
  cache-status is an end-anchored enum (ref :171-173); fallback status is
  the first space-delimited 3-digit number (ref :151-153) and size the
  number right after it (ref :156-158);
- blank lines produce no output row (ref :64-66).

At 100 TB scale this stage is embarrassingly parallel (no shuffle): each
input partition flows through Arrow batches; column pruning upstream means
only the line column (+ requested passthroughs) is ever transferred.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import PARSED_FIELDS, parsed_schema_with

# The Fastly syslog line format (documented at reference README.md:235-243):
# <priority>timestamp cache-server process[pid]: IP "-" "-" date
#   "METHOD path" status size "-" "user-agent" cache-status
# 16 capture groups, same group order as the reference pattern
# (reference src/parse/log_parser.py:20-35).
_FULL_LINE = (
    r"<(\d+)>"                                    # 1 priority
    r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z)"     # 2 timestamp
    r"\s+(\S+)"                                   # 3 cache server
    r"\s+(\S+)\[(\d+)\]:"                         # 4 process, 5 pid
    r"\s+(\S+)"                                   # 6 ip
    r'\s+"([^"]*)"'                               # 7 referrer1
    r'\s+"([^"]*)"'                               # 8 referrer2
    r'\s+([^"]+?)(?=\s+")'                        # 9 date string
    r'\s+"([A-Z]+)\s+([^"]+)"'                    # 10 method, 11 full path
    r"\s+(\d+)"                                   # 12 status
    r"\s+(\d+)"                                   # 13 size
    r'\s+"([^"]*)"'                               # 14 referrer
    r'\s+"([^"]*)"'                               # 15 user agent
    r"\s+(\S+)"                                   # 16 cache status
)

# .match() anchoring for use with Series.str.extract (which uses search).
FAST_PATTERN = re.compile(r"\A" + _FULL_LINE)

# Fallback per-field probes (reference src/parse/log_parser.py:111-186).
P_TIMESTAMP = re.compile(r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z)")
P_PRIORITY = re.compile(r"<(\d+)>")
P_IP = re.compile(r"\b(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})\b")
P_HTTP = re.compile(r'"([A-Z]+)\s+([^"]+)"')
P_STATUS = re.compile(r"\s(\d{3})\s")
P_SIZE = re.compile(r"\s(\d{3})\s+(\d+)\s")
P_UA_MOZILLA = re.compile(r'"([^"]*Mozilla[^"]*)"')
P_UA_LONG = re.compile(r'"([^"]{20,})"')
P_CACHE = re.compile(r"\s(hit|miss|pass|error|synth)\s*$")
P_SERVER = re.compile(r"cache-([^\s]+)")
P_PROCESS = re.compile(r"(\S+)\[(\d+)\]:")

_TS_FORMAT = "%Y-%m-%dT%H:%M:%SZ"


def _none_if_empty(s: pd.Series) -> pd.Series:
    """Reference ``safe_get`` treats '' as absent (src/parse/log_parser.py:45-50)."""
    return s.where(s.notna() & (s != ""), other=None)


def _safe_int(s: pd.Series) -> pd.Series:
    """Vectorized ``safe_int`` (reference src/parse/log_parser.py:38-43)."""
    return pd.to_numeric(_none_if_empty(s), errors="coerce").astype("Int64")


def _parse_ts(s: pd.Series) -> pd.Series:
    """Strict '%Y-%m-%dT%H:%M:%SZ' → naive UTC (ref :76-82)."""
    return pd.to_datetime(s, format=_TS_FORMAT, errors="coerce")


def _split_query(full_path: Optional[str]):
    """path / query_string / params split (reference src/parse/log_parser.py:92-102).

    Returns (path, query_string, params_dict) — params is {} when a path was
    extracted but carried no query string, mirroring the reference.
    """
    if full_path is None:
        return None, None, None
    parts = full_path.split("?", 1)
    path = parts[0]
    qs = parts[1] if len(parts) > 1 else None
    params: dict[str, str] = {}
    if qs:
        for param in qs.split("&"):
            if "=" in param:
                key, value = param.split("=", 1)
                params[key] = value
    return path, qs, params


def parse_lines_pdf(lines: pd.Series) -> pd.DataFrame:
    """Parse a batch of raw lines into the parsed-record frame.

    Pure pandas — reused by both the Spark mapInPandas stage and unit tests.
    Blank (post-strip) lines yield rows of all-NaN that the caller drops.
    """
    raw = lines.astype("string").str.strip()
    n = len(raw)
    out = pd.DataFrame(index=raw.index)
    out["raw_line"] = raw

    nonblank = (raw.notna() & (raw != "")).fillna(False).astype(bool)

    # ---- fast path: anchored full-line pattern ----
    ext = raw.str.extract(FAST_PATTERN)
    fast = ext[0].notna() & nonblank
    slow = ~fast & nonblank

    # columns start all-null
    for col in (
        "priority", "timestamp", "cache_server", "process", "pid", "ip_address",
        "referrer1", "referrer2", "date_string", "http_method", "_full_path",
        "status_code", "response_size", "referrer", "user_agent", "cache_status",
    ):
        out[col] = None

    if fast.any():
        out.loc[fast, "priority"] = _safe_int(ext.loc[fast, 0])
        out.loc[fast, "timestamp"] = _parse_ts(_none_if_empty(ext.loc[fast, 1]))
        out.loc[fast, "cache_server"] = _none_if_empty(ext.loc[fast, 2])
        out.loc[fast, "process"] = _none_if_empty(ext.loc[fast, 3])
        out.loc[fast, "pid"] = _safe_int(ext.loc[fast, 4])
        out.loc[fast, "ip_address"] = _none_if_empty(ext.loc[fast, 5])
        out.loc[fast, "referrer1"] = _none_if_empty(ext.loc[fast, 6])
        out.loc[fast, "referrer2"] = _none_if_empty(ext.loc[fast, 7])
        out.loc[fast, "date_string"] = _none_if_empty(ext.loc[fast, 8])
        out.loc[fast, "http_method"] = _none_if_empty(ext.loc[fast, 9])
        out.loc[fast, "_full_path"] = _none_if_empty(ext.loc[fast, 10])
        out.loc[fast, "status_code"] = _safe_int(ext.loc[fast, 11])
        out.loc[fast, "response_size"] = _safe_int(ext.loc[fast, 12])
        out.loc[fast, "referrer"] = _none_if_empty(ext.loc[fast, 13])
        out.loc[fast, "user_agent"] = _none_if_empty(ext.loc[fast, 14])
        out.loc[fast, "cache_status"] = _none_if_empty(ext.loc[fast, 15])

    # ---- fallback probes, each independent, only over non-matching rows ----
    if slow.any():
        sl = raw[slow]
        out.loc[slow, "timestamp"] = _parse_ts(sl.str.extract(P_TIMESTAMP)[0])
        out.loc[slow, "priority"] = _safe_int(sl.str.extract(P_PRIORITY)[0])
        out.loc[slow, "ip_address"] = _none_if_empty(sl.str.extract(P_IP)[0])

        http = sl.str.extract(P_HTTP)
        out.loc[slow, "http_method"] = _none_if_empty(http[0])
        out.loc[slow, "_full_path"] = http[1].where(http[0].notna(), other=None)

        out.loc[slow, "status_code"] = _safe_int(sl.str.extract(P_STATUS)[0])
        out.loc[slow, "response_size"] = _safe_int(sl.str.extract(P_SIZE)[1])

        ua1 = sl.str.extract(P_UA_MOZILLA)[0]
        ua2 = sl.str.extract(P_UA_LONG)[0]
        ua2 = ua2.where(ua2.notna() & ua2.str.contains("Mozilla", regex=False), other=None)
        out.loc[slow, "user_agent"] = ua1.fillna(ua2)

        out.loc[slow, "cache_status"] = _none_if_empty(sl.str.extract(P_CACHE)[0])
        srv = sl.str.extract(P_SERVER)[0]
        out.loc[slow, "cache_server"] = ("cache-" + srv).where(srv.notna(), other=None)
        proc = sl.str.extract(P_PROCESS)
        out.loc[slow, "process"] = _none_if_empty(proc[0])
        out.loc[slow, "pid"] = _safe_int(proc[1])

    # ---- path / query split (shared by both branches) ----
    paths = [None] * n
    qss = [None] * n
    params_col = [None] * n
    fp_list = out["_full_path"].tolist()
    fast_arr = fast.to_numpy()
    slow_arr = slow.to_numpy()
    for i in range(n):
        fp = fp_list[i]
        if isinstance(fp, str):
            p, qs, params = _split_query(fp)
            paths[i], qss[i], params_col[i] = p, qs, params
        elif slow_arr[i]:
            # fallback branch with no HTTP match: keys absent → all NULL
            pass
        elif fast_arr[i]:
            # fast path with empty full_path can't happen ([^"]+ is 1+ chars)
            pass
    out["path"] = pd.Series(paths, index=raw.index, dtype="object")
    out["query_string"] = pd.Series(qss, index=raw.index, dtype="object")
    out["query_params"] = pd.Series(params_col, index=raw.index, dtype="object")
    out = out.drop(columns=["_full_path"])

    # mark blank rows for the caller to drop
    out["_keep"] = nonblank

    # final dtypes for Arrow
    out["priority"] = out["priority"].astype("Int64").astype("Int32")
    out["pid"] = out["pid"].astype("Int64").astype("Int32")
    out["status_code"] = out["status_code"].astype("Int64").astype("Int32")
    out["response_size"] = out["response_size"].astype("Int64")
    out["timestamp"] = pd.to_datetime(out["timestamp"])
    return out


PARSED_ORDER = [f.name for f in PARSED_FIELDS]


def parse_logs(
    df: DataFrame,
    line_col: str = "text",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Parse ``df[line_col]`` into the parsed-record schema via mapInPandas.

    ``passthrough`` columns (e.g. url, warc_ts, lang) are carried alongside
    the parsed fields.  Upstream column pruning applies: only
    ``passthrough + [line_col]`` is read from the source.
    """
    passthrough = passthrough or []
    in_schema = df.select(*passthrough, line_col).schema
    out_schema = parsed_schema_with([in_schema[c] for c in passthrough])

    def _iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = parse_lines_pdf(pdf[line_col])
            keep = parsed.pop("_keep")
            res = pd.concat(
                [pdf[passthrough].reset_index(drop=True),
                 parsed[PARSED_ORDER].reset_index(drop=True)],
                axis=1,
            )
            yield res[keep.reset_index(drop=True).to_numpy()]

    return df.select(*passthrough, line_col).mapInPandas(_iter, schema=out_schema)


def parse_log_line(line: str) -> dict | None:
    """Single-line convenience wrapper (test/debug parity helper).

    Returns a dict shaped like the reference's ``parse_log_line`` output:
    absent fields are missing keys, except explicit-None cases.
    """
    pdf = parse_lines_pdf(pd.Series([line]))
    if not bool(pdf["_keep"].iloc[0]):
        return None
    row = pdf.iloc[0].drop(labels=["_keep"])
    out = {}
    for k, v in row.items():
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT or v is pd.NA:
            continue
        if k in ("priority", "pid", "status_code", "response_size"):
            v = int(v)
        if k == "timestamp":
            v = v.isoformat()
        out[k] = v
    return out
