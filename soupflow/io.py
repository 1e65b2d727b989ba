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


def _tune_streaming_gen_buffer(min_blocks: int = 32) -> None:
    """Raise the per-task streaming-generator buffer (Ray 2.49 default
    2). A read of FEW files that SplitBlocks into many output blocks is
    one generator task; with buffer=2 it blocks after every 2 yields and
    each resume costs a ~45 ms driver round-trip, which rate-limits the
    WHOLE downstream pipeline to ~20 blocks/s whenever downstream tasks
    are non-trivial (measured: 80 ms/batch stage over one 5k-row file
    ran 3.25 s instead of 0.76 s). Buffered blocks live in the object
    store (spillable), so the cost of running ahead is plasma space —
    bounded by min_blocks x target_max_block_size per in-flight read
    task — not worker heap. At real corpus scale (thousands of files,
    hundreds of concurrent read tasks) buffer=2 is invisible; this
    matters exactly when read parallelism is file-limited."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    cur = getattr(ctx, "_max_num_blocks_in_streaming_gen_buffer", None)
    if cur is not None and cur < min_blocks:
        ctx._max_num_blocks_in_streaming_gen_buffer = min_blocks


def collect_table(ds) -> "pa.Table":
    """Driver-side collect of a BOUNDED (broadcast-side) dataset as one
    Arrow table. ``Dataset.take_all()`` iterates rows and is ~30x
    slower on pandas-formatted blocks (e.g. any map_groups(pandas)
    output: measured 5.5 s for 3.4k rows / 64 blocks vs 0.04 s here);
    fetching block refs and concatenating stays on C paths and is
    zero-copy for arrow blocks. Never call this on unbounded data.

    Pulls ``iter_internal_ref_bundles()`` directly rather than
    ``to_arrow_refs()``: Ray 2.49's to_arrow_refs calls
    ``self.schema(fetch_if_missing=True)`` AFTER streaming the
    bundles, and on an unmaterialized lineage that schema fetch
    launches a second limit-1 execution — which still runs every
    upstream shuffle before the limit, so each collect of an
    aggregate was paying its whole plan ~twice (measured 19.0 s →
    10.4 s on the big_orders HAVING aggregate at sf0.1). Pandas/other
    block formats convert driver-side instead (bounded data by
    contract)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    refs = [block_ref
            for bundle in ds.iter_internal_ref_bundles()
            for block_ref in bundle.block_refs]
    blocks = []
    for b in ray.get(refs):
        if isinstance(b, pd.DataFrame):
            if len(b) or len(b.columns):
                blocks.append(pa.Table.from_pandas(
                    b, preserve_index=False))
        elif b.num_rows or b.num_columns:
            blocks.append(b)
    if not blocks:
        return pa.table({})
    return pa.concat_tables(blocks, promote_options="default")


def collect_rows(ds) -> list:
    """take_all() replacement: list-of-dicts via collect_table's
    block-ref path + Arrow's C to_pylist (row iteration never touches
    pandas blocks). Same bounded-result caveat as collect_table."""
    return collect_table(ds).to_pylist()


def read_corpus(path, *, corpus_format: str = "auto", **kwargs):
    """ray.data.read_lance / read_parquet behind one call.

    ``path`` may be a file, directory, or list of files (parquet)."""
    import ray.data

    _tune_streaming_gen_buffer()
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


class StreamReader:
    """Chunked delimiter-based line reader over a file — parity with
    reference Sources/StreamReader.swift:10 (nextLine/rewind/close),
    plus Python iteration. Reads ``chunk_size`` bytes at a time and
    returns decoded lines without the delimiter; the final unterminated
    line is returned at EOF."""

    def __init__(self, path: str, delimiter: str = "\n",
                 encoding: str = "utf-8", chunk_size: int = 4096) -> None:
        self._fh = open(path, "rb")
        self._delim = delimiter.encode(encoding)
        self._encoding = encoding
        self._chunk_size = chunk_size
        self._buffer = b""
        self._at_eof = False

    def next_line(self):
        """Next line (delimiter stripped), or None at EOF."""
        if self._fh is None:
            raise ValueError("attempt to read from closed StreamReader")
        while True:
            i = self._buffer.find(self._delim)
            if i >= 0:
                line = self._buffer[:i]
                self._buffer = self._buffer[i + len(self._delim):]
                return line.decode(self._encoding)
            if self._at_eof:
                if self._buffer:
                    line, self._buffer = self._buffer, b""
                    return line.decode(self._encoding)
                return None
            chunk = self._fh.read(self._chunk_size)
            if chunk:
                self._buffer += chunk
            else:
                self._at_eof = True

    def rewind(self) -> None:
        self._fh.seek(0)
        self._buffer = b""
        self._at_eof = False

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __iter__(self):
        while True:
            line = self.next_line()
            if line is None:
                return
            yield line

    def __enter__(self) -> "StreamReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
