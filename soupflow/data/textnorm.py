"""Text normalization + PII-style redaction kernels.

Both are pure map-side Arrow C++ RE2 kernels — zero shuffle, zero
per-row Python — the cheapest possible 100-TB shape (each stage is a
single `map_batches` over zero-copy string batches; patterns are
RE2-compatible so DuckDB's regexp_* functions reproduce them exactly
for the oracle).

The reference engine has no corpus-level text ops (single-document
library); these belong to the training-data operator surface
(C4/Gopher-style cleanup passes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe (no lookarounds). Order matters: emails before digit runs
# so an address's digits don't get half-masked first.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_DIGITS_PAT = r"[0-9]{6,}"  # ids / phone-ish runs
_WS_RUN = r"\s+"


def normalize_redact_batch(batch: pa.Table) -> pa.Table:
    """→ (doc_id, clean_text, n_emails, n_digit_runs).

    clean_text = lowercased, email→``<EMAIL>``, long digit
    runs→``<NUM>``, whitespace runs collapsed to single spaces,
    edges trimmed. Counts are taken BEFORE replacement (count_substring
    with the same RE2 pattern)."""
    text = pc.fill_null(batch.column("text"), "")
    n_email = pc.count_substring_regex(text, EMAIL_PAT)
    n_num = pc.count_substring_regex(text, LONG_DIGITS_PAT)
    t = pc.utf8_lower(text)
    t = pc.replace_substring_regex(t, EMAIL_PAT, "<EMAIL>")
    t = pc.replace_substring_regex(t, LONG_DIGITS_PAT, "<NUM>")
    t = pc.replace_substring_regex(t, _WS_RUN, " ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "clean_text": t,
        "n_emails": pc.cast(n_email, pa.int64()),
        "n_digit_runs": pc.cast(n_num, pa.int64()),
    })


def normalize_redact(ds):
    return ds.select_columns(["doc_id", "text"]).map_batches(
        normalize_redact_batch, batch_format="pyarrow")
