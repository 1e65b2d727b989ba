import re


def strip_newlines(s: str) -> str:
    """Reference TextUtil.stripNewlines: remove newline + following indent."""
    return re.sub(r"\n\s*", "", s)
