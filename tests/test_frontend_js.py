"""Frontend JavaScript contract tests (VERDICT r3 item 6).

This container ships NO JavaScript engine (no node/deno/quickjs, no
browser), so the page's 500-line script cannot be *executed* in CI.
These tests instead enforce every statically-checkable contract between
``gui/templates/index.html`` and the Python server — the break classes a
frontend regression actually produces:

  * the script must tokenize with balanced (), {}, [] outside strings /
    template literals / comments (catches truncated or mis-pasted edits);
  * every element id the script looks up ($("x") / getElementById) must
    exist in the document markup;
  * every ``api("route")`` / fetch("/api/route") the script calls must be
    dispatched by ``gui/server.py``;
  * every SSE event the script subscribes to must be emitted somewhere in
    the backend (and vice versa: every emitted display event must have a
    listener — dead events are a break too);
  * every inline ``onclick`` handler must call a function the script
    defines.

Reference: the original page is scripts/templates/index.html:304-404
(plotly + socket.io); this page is the from-scratch canvas/SSE rebuild.
"""

from __future__ import annotations

import os
import re

import pytest

GUI_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tpu_sdr", "gui",
)
INDEX = os.path.join(GUI_DIR, "templates", "index.html")


@pytest.fixture(scope="module")
def page() -> str:
    with open(INDEX, encoding="utf-8") as f:
        return f.read()


@pytest.fixture(scope="module")
def script(page: str) -> str:
    """All inline <script> bodies concatenated."""
    blocks = re.findall(r"<script[^>]*>(.*?)</script>", page, re.S)
    assert blocks, "index.html must contain an inline script"
    return "\n".join(blocks)


@pytest.fixture(scope="module")
def markup(page: str) -> str:
    """The page with script bodies removed (the DOM the script sees)."""
    return re.sub(r"<script[^>]*>.*?</script>", "", page, flags=re.S)


def _strip_js(src: str) -> str:
    """Remove strings, template literals and comments; keep delimiters.

    Template literals may nest ${ ... } expressions (which may themselves
    contain strings/braces) — the stripper keeps those expression bodies,
    replacing only the literal text runs.
    """
    out = []
    i, n = 0, len(src)
    mode: list[str] = []  # stack of "`" contexts for ${} nesting

    def at(j):
        return src[j] if j < n else ""

    while i < n:
        c = src[i]
        if c in "'\"":
            q = c
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
            out.append("·")  # placeholder: no delimiters inside
            continue
        if c == "`":
            i += 1
            while i < n and src[i] != "`":
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == "$" and at(i + 1) == "{":
                    # keep the expression body — recurse via mode stack
                    out.append("{")
                    i += 2
                    depth = 1
                    start = i
                    while i < n and depth:
                        if src[i] == "{":
                            depth += 1
                        elif src[i] == "}":
                            depth -= 1
                        elif src[i] in "'\"`":
                            # strings inside the expression: skip
                            qq = src[i]
                            i += 1
                            while i < n and src[i] != qq:
                                i += 2 if src[i] == "\\" else 1
                        i += 1
                    out.append(_strip_js(src[start : i - 1]))
                    out.append("}")
                    continue
                i += 1
            i += 1
            continue
        if c == "/" and at(i + 1) == "/":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "/" and at(i + 1) == "*":
            i += 2
            while i < n and not (src[i] == "*" and at(i + 1) == "/"):
                i += 1
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def test_script_delimiters_balanced(script):
    stripped = _strip_js(script)
    pairs = {")": "(", "]": "[", "}": "{"}
    stack: list[tuple[str, int]] = []
    line = 1
    for ch in stripped:
        if ch == "\n":
            line += 1
        elif ch in "([{":
            stack.append((ch, line))
        elif ch in ")]}":
            assert stack, f"unmatched {ch!r} at line ~{line}"
            opener, oline = stack.pop()
            assert opener == pairs[ch], (
                f"mismatched {opener!r} (line ~{oline}) closed by {ch!r} "
                f"(line ~{line})"
            )
    assert not stack, f"unclosed {stack[-1][0]!r} from line ~{stack[-1][1]}"


def test_dom_ids_exist(script, markup):
    wanted = set(re.findall(r'\$\("([\w-]+)"\)', script))
    wanted |= set(re.findall(r'getElementById\("([\w-]+)"\)', script))
    assert wanted, "expected the script to look up element ids"
    have = set(re.findall(r'id="([\w-]+)"', markup))
    missing = sorted(wanted - have)
    assert not missing, f"script references missing element ids: {missing}"


def _server_source() -> str:
    srcs = []
    for name in ("server.py",):
        with open(os.path.join(GUI_DIR, name), encoding="utf-8") as f:
            srcs.append(f.read())
    return "\n".join(srcs)


def test_api_routes_dispatched(script):
    server = _server_source()
    routes = set(re.findall(r'\bapi\("([\w/-]+)"', script))
    routes |= {
        m.removeprefix("/api/")
        for m in re.findall(r'fetch\("(/api/[\w/-]+)"', script)
    }
    assert routes, "expected the script to call api routes"
    missing = sorted(r for r in routes if f'"/api/{r}"' not in server)
    assert not missing, f"script calls routes the server never serves: {missing}"


def _backend_source() -> str:
    srcs = []
    for name in sorted(os.listdir(GUI_DIR)):
        if name.endswith(".py"):
            with open(os.path.join(GUI_DIR, name), encoding="utf-8") as f:
                srcs.append(f.read())
    return "\n".join(srcs)


def test_sse_events_wired_both_ways(script):
    backend = _backend_source()
    listened = set(re.findall(r'addEventListener\("(\w+)"', script))
    # SSE event names are the first argument of backend emits.
    emitted = set(re.findall(r'emit\(\s*"(\w+)"', backend))
    emitted |= set(re.findall(r'_publish\(\s*"(\w+)"', backend))
    not_emitted = sorted(listened - emitted)
    assert not not_emitted, (
        f"script listens for events the backend never emits: {not_emitted}"
    )
    # Display events with no listener are dead wire — also a break.
    display_events = {
        "frame_data", "receiver_status", "filter_preview", "waterfall_row",
        "zoom_frame", "plot_reset",
    }
    dead = sorted((display_events & emitted) - listened)
    assert not dead, f"backend display events with no JS listener: {dead}"


def test_every_button_is_wired(script, markup):
    """Every <button id=..> in the markup must get an onclick (or event
    listener) assigned by the script — a dead button is a frontend break
    the server-side tests cannot see."""
    buttons = set(re.findall(r'<button[^>]*\bid="([\w-]+)"', markup))
    assert buttons, "expected buttons in the markup"
    wired = set(re.findall(r'\$\("([\w-]+)"\)\.onclick', script))
    wired |= set(
        re.findall(r'\$\("([\w-]+)"\)\.addEventListener', script)
    )
    dead = sorted(buttons - wired)
    assert not dead, f"buttons with no click handler: {dead}"


def test_designer_payload_keys_match_backend(script):
    """The filter-designer payload the page posts (the ``dcfg()`` object,
    sent to /api/update_filter_config) must use the keys the backend
    designer path reads (reference designer fields,
    fft_analyzer_gui.py:1167-1199)."""
    backend = _backend_source()
    m = re.search(r"dcfg\s*=\s*\(\)\s*=>\s*\((\{.*?\})\)", script, re.S)
    assert m, "script must build the designer payload in dcfg()"
    keys = set(re.findall(r"(\w+)\s*:", m.group(1)))
    assert keys >= {"kind", "btype", "order"}, keys
    missing = sorted(
        k for k in keys if f'"{k}"' not in backend and f"'{k}'" not in backend
    )
    assert not missing, (
        f"designer payload keys the backend never reads: {missing}"
    )


def _handler_bodies(script: str) -> list[str]:
    """Extract each ``addEventListener("evt", e => { ... })`` callback body
    by brace matching, so payload-field scans never touch unrelated code
    that happens to use a variable named ``d``."""
    bodies = []
    for m in re.finditer(r'addEventListener\("\w+",\s*e\s*=>\s*\{', script):
        i = m.end()
        depth = 1
        start = i
        while i < len(script) and depth:
            c = script[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            elif c in "'\"`":
                q = c
                i += 1
                while i < len(script) and script[i] != q:
                    i += 2 if script[i] == "\\" else 1
            i += 1
        bodies.append(script[start : i - 1])
    return bodies


def test_sse_payload_fields_exist_in_backend(script):
    """Every field an SSE handler reads off its parsed payload (``d.xyz``
    inside an addEventListener callback, plus the helpers those bodies
    call by convention on the same payload names) must appear as a quoted
    key in the backend sources — a renamed payload field breaks the page
    silently otherwise. Scoped to handler bodies so unrelated variables
    named ``d`` can never produce false failures (review finding)."""
    backend = _backend_source()
    bodies = _handler_bodies(script)
    assert bodies, "expected addEventListener handler bodies"
    fields = set()
    for b in bodies:
        fields |= set(re.findall(r"\bd\.([A-Za-z_]\w*)", b))
    assert fields, "expected d.<field> payload accesses in handlers"
    # methods invoked on payload VALUES (arrays/numbers), not payload keys
    fields -= {
        "length", "map", "slice", "forEach", "filter", "join", "toFixed",
        "toExponential",
    }
    missing = sorted(
        f for f in fields
        if f'"{f}"' not in backend and f"'{f}'" not in backend
    )
    assert not missing, (
        f"handlers read payload fields the backend never emits: {missing}"
    )
