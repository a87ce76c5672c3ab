"""Run reference functions from source for baseline timing (no code copied).

Same AST-extraction approach as tests/ref_harness.py; duplicated minimally so
benchmarks do not depend on the test tree.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

import h5py
import numpy as np

REFERENCE_DIR = Path("/root/reference")


class _LooseVersion:
    def __init__(self, v):
        self.vstring = str(v)

    def _key(self):
        return [
            int(t) if t.isdigit() else t
            for t in re.findall(r"\d+|[a-zA-Z]+", self.vstring)
        ]

    def __le__(self, other):
        return self._key() <= other._key()

    def __lt__(self, other):
        return self._key() < other._key()


def load_reference_functions(rel_path: str, names: list[str]):
    src = (REFERENCE_DIR / rel_path).read_text()
    tree = ast.parse(src)
    wanted = [
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in names
    ]
    module = ast.Module(body=wanted, type_ignores=[])
    code = compile(module, str(REFERENCE_DIR / rel_path), "exec")
    ns = {
        "np": np,
        "h5py": h5py,
        "LooseVersion": _LooseVersion,
        "__builtins__": __builtins__,
    }
    exec(code, ns)  # noqa: S102
    return {n: ns[n] for n in names if n in ns}
