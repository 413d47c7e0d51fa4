"""Load the reference GUI's pure host-side defs for adversarial parity tests.

The reference file (``/root/reference/scripts/fft_analyzer_gui.py``) is
UNTRUSTED third-party content and imports Qt/Flask/SocketIO, none of which we
want executed. This helper parses the module AST and executes ONLY:

- top-level ``NAME = <literal arithmetic>`` constant assignments (values
  restricted to constants, names, and arithmetic — no calls, no attributes),
- the ``decode_mag_16iq_le`` / ``decode_iq_components`` functions,
- the ``design_iir_filter`` / ``quantize_coefficients`` / ``int8_to_byte``
  designer functions (pure SciPy/NumPy; the SciPy prototypes are injected
  by us, the reference's own imports never execute),
- the ``MultiPacketAssembler`` class,

in a namespace containing just ``np``, ``time`` and a silenced ``print``.
Nothing else from the file runs. Tests feed OUR wire packets through the
reference's actual reassembly and decode math (``fft_analyzer_gui.py:250-270,
308-352``) — the drop-in-compatibility proof.
"""

from __future__ import annotations

import ast
import time
import types

import numpy as np

REFERENCE_GUI = "/root/reference/scripts/fft_analyzer_gui.py"

_WANTED_DEFS = {
    "decode_mag_16iq_le",
    "decode_iq_components",
    # pure SciPy/NumPy designer math (fft_analyzer_gui.py:108-179) — the
    # oracle for the 12-byte coefficient wire parity tests
    "design_iir_filter",
    "quantize_coefficients",
    "int8_to_byte",
}
_WANTED_CLASSES = {"MultiPacketAssembler"}

_SAFE_EXPR_NODES = (
    ast.Constant,
    ast.Name,
    ast.Load,
    ast.BinOp,
    ast.UnaryOp,
    ast.Add,
    ast.Sub,
    ast.Mult,
    ast.Div,
    ast.FloorDiv,
    ast.Mod,
    ast.Pow,
    ast.USub,
    ast.UAdd,
)


def _is_safe_const_assign(node: ast.stmt) -> bool:
    if not isinstance(node, ast.Assign) or len(node.targets) != 1:
        return False
    t = node.targets[0]
    if not (isinstance(t, ast.Name) and t.id.isupper()):
        return False
    return all(isinstance(n, _SAFE_EXPR_NODES) for n in ast.walk(node.value))


def load_reference_host(path: str = REFERENCE_GUI) -> types.SimpleNamespace:
    """Execute only the whitelisted pure defs; return them as a namespace."""
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        tree = ast.parse(f.read(), filename=path)
    selected: list[ast.stmt] = []
    for node in tree.body:
        if _is_safe_const_assign(node):
            selected.append(node)
        elif isinstance(node, ast.FunctionDef) and node.name in _WANTED_DEFS:
            selected.append(node)
        elif isinstance(node, ast.ClassDef) and node.name in _WANTED_CLASSES:
            selected.append(node)
    mod = ast.Module(body=selected, type_ignores=[])
    from scipy.signal import bessel, butter, cheby1, cheby2, ellip

    ns: dict = {
        "np": np,
        "time": time,
        # design_iir_filter's SciPy prototypes, imported by US (the
        # reference's own `from scipy.signal import ...` never executes)
        "butter": butter,
        "cheby1": cheby1,
        "cheby2": cheby2,
        "ellip": ellip,
        "bessel": bessel,
        "print": lambda *a, **k: None,  # silence the assembler's debug print
        "__builtins__": {
            "__build_class__": __build_class__,
            "__name__": "reference_host_extract",
            "len": len,
            "all": all,
            "sum": sum,
            "range": range,
            "int": int,
            "float": float,
            "super": super,
            "object": object,
            "ValueError": ValueError,
        },
    }
    exec(compile(mod, path, "exec"), ns)  # noqa: S102 - vetted AST subset only
    missing = (_WANTED_DEFS | _WANTED_CLASSES) - set(ns)
    if missing:
        raise RuntimeError(f"reference defs not found: {missing}")
    return types.SimpleNamespace(**{k: v for k, v in ns.items() if not k.startswith("__")})
