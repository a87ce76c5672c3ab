"""Execute reference functions *from source* for golden-output comparison.

The reference tree at /root/reference is read-only and partially
un-importable (its fast5 module imports the absent `albacore` package, and
Python 3.12 removed `distutils`). To regression-test our vectorized
re-implementations against the reference's actual behavior, this helper
extracts individual function definitions from a reference file via AST and
executes them in a namespace with the few globals they need. Nothing is
copied into the repo; the reference code runs from its own files at test time.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

import h5py
import numpy as np

REFERENCE_DIR = Path("/root/reference")


class _LooseVersion:
    """Minimal stand-in for distutils.version.LooseVersion comparisons."""

    def __init__(self, v):
        self.vstring = str(v)

    def _key(self):
        return [
            int(tok) if tok.isdigit() else tok
            for tok in re.findall(r"\d+|[a-zA-Z]+", self.vstring)
        ]

    def __le__(self, other):
        return self._key() <= other._key()

    def __lt__(self, other):
        return self._key() < other._key()


def load_reference_functions(rel_path: str, names: list[str], extra_globals=None):
    """Exec only the named top-level functions from a reference source file."""
    src = (REFERENCE_DIR / rel_path).read_text()
    tree = ast.parse(src)
    wanted = [
        node
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.Assign)) and _node_matches(node, names)
    ]
    module = ast.Module(body=wanted, type_ignores=[])
    code = compile(module, str(REFERENCE_DIR / rel_path), "exec")
    namespace = {
        "np": np,
        "h5py": h5py,
        "LooseVersion": _LooseVersion,
        "list": list,
        "__builtins__": __builtins__,
    }
    if extra_globals:
        namespace.update(extra_globals)
    exec(code, namespace)  # noqa: S102 — running reference code for goldens
    return {name: namespace[name] for name in names if name in namespace}


def _node_matches(node, names):
    if isinstance(node, ast.FunctionDef):
        return node.name in names
    if isinstance(node, ast.Assign):
        return any(
            isinstance(t, ast.Name) and t.id in names for t in node.targets
        )
    return False


def reference_get_read_data():
    fns = load_reference_functions(
        "nanorevutils/nanorev_fast5_handeler.py", ["get_read_data"]
    )
    return fns["get_read_data"]


def reference_signal_segmentation():
    fns = load_reference_functions(
        "nanorevutils/preprocessing.py", ["signal_segmentation"]
    )
    return fns["signal_segmentation"]


def reference_preprocessing(names):
    return load_reference_functions("nanorevutils/preprocessing.py", names)


def reference_input_handler(names):
    return load_reference_functions("nanorevutils/input_handeler.py", names)


def reference_output_handler(names):
    return load_reference_functions("nanorevutils/output_handeler.py", names)


def reference_trainutils(names, extra_globals=None):
    return load_reference_functions(
        "nanorevutils/nanorevtrainutils.py", names, extra_globals
    )
