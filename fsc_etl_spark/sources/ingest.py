"""Driver-side ingest utilities (SURVEY.md §2.1 S1-S4, S11).

The reference's extract phase is driver-local: idempotent HTTP fetch
(``/root/reference/utils/extract_functions.py:7-20``), dated archive +
``last/`` snapshot rotation (``extract_functions.py:24-28``), path
resolution (``extract_functions.py:32-33``), and Databricks
widget/secret parameters (``utils/parameters_databricks.py:2-9``).

Re-expressed without dbutils: stdlib HTTP/shutil/env. The fetch stays
a driver op by design at this scale (5 small CSVs daily); the 100 TB
pattern — distributing a large URL list over executors — is provided
by :func:`fetch_distributed` (URL table → ``mapInPandas`` workers),
which the tests drive with ``file://`` URLs.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import urllib.request
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def download_file(url: str, destination: str, overwrite: bool = False) -> bool:
    """S1: fetch one URL to a local path; idempotent — returns False
    (skip) when the file already exists, like extract_functions.py:12."""
    if os.path.exists(destination) and not overwrite:
        return False
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
    tmp = destination + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    os.replace(tmp, destination)
    return True


def download_files(base_url: str, files: Sequence[str], destination: str) -> list[str]:
    """S2: map S1 over a file list; returns the local paths."""
    out = []
    for name in files:
        path = os.path.join(destination, name)
        download_file(f"{base_url.rstrip('/')}/{name}", path)
        out.append(path)
    return out


def archive_snapshot(
    local_dir: str,
    archive_root: str,
    run_date: dt.date,
    last_dir: str | None = None,
) -> str:
    """S3: copy the fetched files to ``archive_root/y/m/d/`` and
    refresh the ``last/`` snapshot (rm-then-replace, like
    extract_functions.py:24-28 but atomic per file)."""
    dated = os.path.join(
        archive_root, f"{run_date.year:04d}", f"{run_date.month:02d}", f"{run_date.day:02d}"
    )
    os.makedirs(dated, exist_ok=True)
    for name in os.listdir(local_dir):
        shutil.copy2(os.path.join(local_dir, name), os.path.join(dated, name))
    if last_dir is not None:
        staged = last_dir.rstrip("/") + ".staged"
        shutil.rmtree(staged, ignore_errors=True)
        shutil.copytree(dated, staged)
        old = last_dir.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(last_dir):
            os.rename(last_dir, old)
        os.rename(staged, last_dir)
        shutil.rmtree(old, ignore_errors=True)
    return dated


def get_raw_paths(files: Sequence[str], mount_point: str) -> list[dict[str, str]]:
    """S4: file list → [{filename, rawpath}] dicts, flattening any
    subdirectory component (extract_functions.py:32-33)."""
    return [
        {"filename": os.path.basename(f), "rawpath": os.path.join(mount_point, f)}
        for f in files
    ]


def get_parameter(name: str, default: str | None = None) -> str:
    """S11: widget parameter → environment variable."""
    val = os.environ.get(name, default)
    if val is None:
        raise KeyError(f"required parameter {name!r} not set")
    return val


def get_secret_parameter(scope: str, key: str, default: str | None = None) -> str:
    """S11: secret-scope lookup → namespaced environment variable
    (``SCOPE__KEY``). Real deployments plug in their secret manager."""
    return get_parameter(f"{scope.upper()}__{key.upper()}", default)


def fetch_distributed(
    spark: SparkSession,
    urls: DataFrame,
    dest_root: str,
    url_col: str = "url",
    name_col: str = "name",
) -> DataFrame:
    """The scale path for S1/S2: fan a URL table out over executors.

    Each partition's worker fetches its URLs (idempotent per file) and
    reports (name, path, fetched, bytes). ``dest_root`` must be shared
    storage in a real cluster. Arrow-batched via ``mapInPandas``: the
    per-row work is network I/O, which is exactly what the Python
    boundary is for.
    """

    def fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                path = os.path.join(dest_root, row[name_col])
                fetched = download_file(row[url_col], path)
                out.append(
                    {
                        "name": row[name_col],
                        "path": path,
                        "fetched": fetched,
                        "bytes": os.path.getsize(path),
                    }
                )
            yield pd.DataFrame(out)

    return urls.mapInPandas(
        fetch_batch, "name string, path string, fetched boolean, bytes long"
    )
