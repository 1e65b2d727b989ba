"""Corpus I/O: Lance-first with Parquet fallback.

The production corpus is a Lance table of interleaved documents
(BASELINE.json input_hint); this sandbox has no `lance` wheel, so every
entry point routes through these helpers: they use
``ray.data.read_lance`` / ``Dataset.write_lance`` when the pylance
package is importable, and Parquet otherwise. Pipelines are
format-agnostic — blocks are Arrow either way.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def detect_format(path: str) -> str:
    """'lance' for *.lance datasets (dir with _versions), else parquet."""
    if path.endswith(".lance"):
        return "lance"
    if os.path.isdir(path) and os.path.isdir(
            os.path.join(path, "_versions")):
        return "lance"
    return "parquet"


def read_corpus(path, *, corpus_format: str = "auto", **kwargs):
    """ray.data.read_lance / read_parquet behind one call.

    ``path`` may be a file, directory, or list of files (parquet)."""
    import ray.data

    if corpus_format == "auto":
        probe = path[0] if isinstance(path, list) else path
        corpus_format = detect_format(probe)
    if corpus_format == "lance":
        if not lance_available():
            raise RuntimeError(
                "corpus is Lance but the `lance` package is not "
                "installed; install pylance or convert to parquet")
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def write_corpus(ds, path: str, *, corpus_format: str = "auto",
                 **kwargs) -> None:
    """Dataset.write_lance / write_parquet behind one call."""
    if corpus_format == "auto":
        corpus_format = "lance" if (path.endswith(".lance")
                                    and lance_available()) else "parquet"
    if corpus_format == "lance":
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)
