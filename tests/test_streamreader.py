"""StreamReader parity tests (reference Sources/StreamReader.swift:10)."""
from soupflow.io import StreamReader


def _write(tmp_path, data: bytes):
    p = tmp_path / "f.txt"
    p.write_bytes(data)
    return str(p)


def test_next_line_and_eof(tmp_path):
    p = _write(tmp_path, b"first\nsecond line\nthird")
    r = StreamReader(p, chunk_size=4)  # delimiter spans chunk reads
    assert r.next_line() == "first"
    assert r.next_line() == "second line"
    assert r.next_line() == "third"  # unterminated last line
    assert r.next_line() is None
    assert r.next_line() is None
    r.close()


def test_rewind_and_iteration(tmp_path):
    p = _write(tmp_path, b"a\nb\nc\n")
    r = StreamReader(p)
    assert r.next_line() == "a"
    r.rewind()
    assert list(r) == ["a", "b", "c"]
    r.close()


def test_custom_delimiter_and_context_manager(tmp_path):
    p = _write(tmp_path, b"x||y||z")
    with StreamReader(p, delimiter="||", chunk_size=3) as r:
        assert list(r) == ["x", "y", "z"]


def test_read_after_close_raises(tmp_path):
    import pytest
    p = _write(tmp_path, b"a\n")
    r = StreamReader(p)
    r.close()
    with pytest.raises(ValueError):
        r.next_line()


def test_empty_file(tmp_path):
    p = _write(tmp_path, b"")
    with StreamReader(p) as r:
        assert r.next_line() is None
