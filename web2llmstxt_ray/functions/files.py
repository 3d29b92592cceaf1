"""File/IO utilities (SURVEY M20, K6, K7, S1, S6).

- safe/atomic writes (``utils/file_utils.py:26-42``; atomic tempfile+
  rename pattern from ``llmsgen/utils/file_utils.py:62-92``),
- filename cleaning + numbered availability (``utils/file_utils.py:
  179-216``),
- seed URL normalization (``scripts/generate_llms.py:117-125``:
  ``https://`` prefixing),
- description-cache persistence as Parquet (replacing the reference's
  per-insert JSON flush, ``models/client.py:54-92`` — batched append,
  loaded into the broadcast dict the Describer probes).
"""

from __future__ import annotations

import os
import re
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from .. import schema as S

_UNSAFE_RE = re.compile(r"[^\w\-_. ]")


def clean_filename(name: str, max_length: int = 120) -> str:
    """Filesystem-safe filename (utils/file_utils.py:179-196):
    unsafe chars → underscore, whitespace collapsed, length-capped."""
    name = _UNSAFE_RE.sub("_", name)
    name = re.sub(r"\s+", " ", name).strip().strip(".")
    if len(name) > max_length:
        name = name[:max_length].rstrip("._ ")
    return name or "unnamed"


def available_numbered_path(path: str) -> str:
    """First non-existing ``name``, ``name (1)``, ``name (2)``…
    (utils/file_utils.py:198-216)."""
    if not os.path.exists(path):
        return path
    stem, ext = os.path.splitext(path)
    i = 1
    while os.path.exists(f"{stem} ({i}){ext}"):
        i += 1
    return f"{stem} ({i}){ext}"


def write_safe_file(path: str, content: str) -> str:
    """Atomic text write: tempfile in the target dir + rename
    (llmsgen/utils/file_utils.py:62-92 pattern). Returns the path."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", text=True)
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(content)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def save_env_var(key: str, value: str, env_path: str = ".env") -> str:
    """Atomic upsert of one ``KEY=value`` line in a dotenv file (K7 —
    reference ``save_api_key_to_env``, ``llmsgen/utils/file_utils.py:
    62-92``): existing lines are preserved verbatim, every line whose
    stripped form starts with ``KEY=`` is replaced in place, a missing
    key is appended, and the whole rewrite is tempfile+rename so a
    crash mid-write can never leave a torn .env. Returns the path."""
    if not key or "=" in key or "\n" in key or "\n" in str(value):
        raise ValueError(f"invalid dotenv key/value: {key!r}")
    d = os.path.dirname(os.path.abspath(env_path)) or "."
    os.makedirs(d, exist_ok=True)
    existing: list[str] = []
    if os.path.exists(env_path):
        with open(env_path, encoding="utf-8") as f:
            existing = f.readlines()
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".env_tmp_", text=True)
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            found = False
            for line in existing:
                if line.strip().startswith(f"{key}="):
                    f.write(f"{key}={value}\n")
                    found = True
                else:
                    f.write(line)
            if not found:
                f.write(f"{key}={value}\n")
        os.replace(tmp, env_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return env_path


def read_env_file(env_path: str = ".env") -> dict[str, str]:
    """Parse a dotenv file to {key: value} (comments / blank lines
    skipped, first ``=`` splits) — the round-trip probe for
    :func:`save_env_var`."""
    out: dict[str, str] = {}
    if not os.path.exists(env_path):
        return out
    with open(env_path, encoding="utf-8") as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#") or "=" not in s:
                continue
            k, v = s.split("=", 1)
            out[k.strip()] = v
    return out


def normalize_seed_url(url: str) -> str:
    """CLI seed normalization (scripts/generate_llms.py:117-125):
    strip whitespace, prefix ``https://`` when scheme-less."""
    url = url.strip()
    if not url:
        return url
    if "://" not in url:
        url = "https://" + url
    return url


# --- description cache persistence (S6/K6) ---


def load_description_cache(path: str) -> dict[tuple[str, str], str]:
    """Parquet cache file → the broadcast probe dict keyed by
    (url, content_hash) (models/client.py:41-52 semantics)."""
    if not os.path.exists(path):
        return {}
    t = pq.read_table(path)
    return {
        (u, h): d
        for u, h, d in zip(t.column("url").to_pylist(),
                           t.column("content_hash").to_pylist(),
                           t.column("description").to_pylist())
    }


def append_description_cache(path: str, new_rows: pa.Table) -> int:
    """Batched cache append (vs the reference's per-insert JSON dump,
    models/client.py:83-92): merge + atomic rewrite; last write wins per
    (url, content_hash). Returns total cached entries."""
    merged = load_description_cache(path)
    for u, h, d in zip(new_rows.column("url").to_pylist(),
                       new_rows.column("content_hash").to_pylist(),
                       new_rows.column("description").to_pylist()):
        merged[(u, h)] = d
    keys = sorted(merged)
    table = pa.Table.from_pydict(
        {
            "url": [k[0] for k in keys],
            "content_hash": [k[1] for k in keys],
            "description": [merged[k] for k in keys],
        },
        schema=S.DESCRIPTION_CACHE,
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return len(merged)
