"""REST API source (SURVEY.md §2.1 S5).

The reference fetches a JSON API on the Airflow worker — a single
driver-side GET per day slice (reference:
dags/vcapital_staging/tasks/components/extract.py:81-132), then
pandas-normalizes into staging (staging load.py:94-118). Two modes
here, mirroring SURVEY's scale note:

- :func:`fetch_json` — the driver-side single fetch, for genuinely
  small daily slices (the reference's actual workload).
- :func:`fetch_partitioned` — the scale path: a DataFrame of request
  specs (url + params) fans out over ``mapInPandas``, each task
  fetching its slice and emitting typed rows. 10k API pages become a
  10k-row spec frame → cluster-wide parallel ingest with no driver
  bottleneck, retry handled per-partition by Spark task retry.

The HTTP call itself is injectable (``fetcher``) so tests (and
air-gapped runs) plug a deterministic fake; the default uses
``urllib`` from the standard library.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _default_fetcher(url: str, params: dict | None = None) -> list[dict]:
    """GET url?params → parsed JSON list (stdlib only; requests is not
    assumed present). Newlines are scrubbed from string values the same
    way the reference scrubs them before landing (extract.py:109-120)."""
    import urllib.parse
    import urllib.request

    if params:
        url = url + "?" + urllib.parse.urlencode(params)
    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        payload = json.loads(resp.read().decode("utf-8"))
    rows = payload if isinstance(payload, list) else [payload]
    return [
        {
            k: (v.replace("\n", " ") if isinstance(v, str) else v)
            for k, v in row.items()
        }
        for row in rows
    ]


def fetch_json(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    params: dict | None = None,
    fetcher: Callable[[str, dict | None], list[dict]] = _default_fetcher,
) -> DataFrame:
    """Driver-side fetch → DataFrame with an enforced schema (S5).
    For the reference's daily-slice payloads (hundreds of rows); use
    :func:`fetch_partitioned` when the spec list is itself large."""
    rows = fetcher(url, params)
    return spark.createDataFrame(rows, schema=schema)


def fetch_partitioned(
    specs: DataFrame,
    schema: T.StructType,
    fetcher: Callable[[str, dict | None], list[dict]] = _default_fetcher,
    url_col: str = "url",
    params_col: str | None = "params",
) -> DataFrame:
    """Distributed fetch: one request per spec row, executed inside
    ``mapInPandas`` tasks (Arrow-batched, constant driver memory).

    ``specs`` carries one row per request: ``url`` string plus an
    optional ``params`` map<string,string>. Repartition the spec frame
    to control fetch parallelism (one task ≈ one batch of requests).
    """
    field_names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, row in pdf.iterrows():
                params = None
                if params_col is not None and params_col in pdf.columns:
                    raw = row[params_col]
                    params = dict(raw) if raw is not None else None
                out.extend(fetcher(row[url_col], params))
            yield pd.DataFrame(
                [[r.get(n) for n in field_names] for r in out], columns=field_names
            )

    return specs.mapInPandas(run, schema=schema)
