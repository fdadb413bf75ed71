"""Small host-side utilities (reference: utils/utils.py:42-66)."""
from __future__ import annotations


def print_arguments(args, length: int = 100, sep: str = ": ", delim: str = " | "):
    """Pretty-print a flat dict of arguments (utils/utils.py:42-66)."""
    if hasattr(args, "__dict__") and not isinstance(args, dict):
        args = vars(args)
    text = [f"{k}{sep}{args[k]}" for k in args.keys()]
    cl = 0
    out = []
    for n, line in enumerate(text):
        if cl + len(line) > length:
            out.append("\n")
            cl = 0
        out.append(line)
        cl += len(line)
        if n != len(text) - 1:
            out.append(delim)
            cl += len(delim)
    print("".join(out))
