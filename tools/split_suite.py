"""One-shot mechanical splitter: suite.py -> suite/ package.

Partitions the monolithic registry file at top-level statement
boundaries into per-family modules (narrative order preserved, so
QUERIES insertion order — the driver-window contract — is unchanged),
resolving cross-module name references via explicit imports computed
from the AST. Run once from the repo root; kept in tools/ as the
record of how the split was produced.
"""

from __future__ import annotations

import ast
import builtins
from pathlib import Path

SRC = Path("vectordb_migrator_spark/suite.py")
PKG = Path("vectordb_migrator_spark/suite")

# (first_line_of_section_banner, module_stem, max_chunk_lines)
SECTIONS = [
    (126, "s01_reference", 4000),
    (428, "s02_analytics", 4000),
    (638, "s03_dedup", 4000),
    (805, "s04_similarity", 2200),
    (2751, "s05_text", 4000),
    (3331, "s06_multimodal", 4000),
    (3839, "s07_sketches", 4000),
    (4780, "s08_relational", 2200),
    (10265, "s09_extensions", 2200),
]
TAIL_BANNER = 16157  # "Driver-window ordering" banner -> __init__.py
PRELUDE_END = 125  # last line of _PLANES2


def node_names(node: ast.stmt) -> list[str]:
    out: list[str] = []
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.append(node.name)
    elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
        targets = node.targets if isinstance(node, ast.Assign) else [node.target]
        for t in targets:
            for n in ast.walk(t):
                # only a bare-Name store DEFINES a module global; the
                # base of a Subscript/Attribute store (ORACLES[...] = x)
                # is a Load of an existing object, not a definition
                if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Store):
                    out.append(n.id)
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            out.append((a.asname or a.name).split(".")[0])
    return out


def main() -> None:
    lines = SRC.read_text().splitlines(keepends=True)
    tree = ast.parse(SRC.read_text())

    # ---- partition top-level nodes into chunks ------------------------
    sections = SECTIONS + [(TAIL_BANNER, "__tail__", 10**9)]
    chunks: list[tuple[str, list[ast.stmt]]] = []  # (stem, nodes)
    cur_stem, cur_max, cur_nodes, cur_start = None, 0, [], 1
    sec_i = 0
    part = 0

    def flush():
        nonlocal cur_nodes, part
        if cur_nodes:
            suffix = chr(ord("a") + part) if part or want_parts else ""
            chunks.append((cur_stem + (f"_{suffix}" if suffix else ""), cur_nodes))
            part += 1
            cur_nodes = []

    want_parts = False
    for node in tree.body:
        start = node.lineno
        # advance section pointer
        while sec_i < len(sections) and start >= sections[sec_i][0]:
            flush()
            cur_stem, cur_max = sections[sec_i][1], sections[sec_i][2]
            part = 0
            # will this section need multiple parts?
            nxt = sections[sec_i + 1][0] if sec_i + 1 < len(sections) else TAIL_BANNER
            want_parts = (nxt - sections[sec_i][0]) > cur_max
            sec_i += 1
        if cur_stem is None:
            continue  # prelude node
        if cur_nodes and (node.end_lineno - cur_nodes[0].lineno) > cur_max:
            flush()
        cur_nodes.append(node)
    flush()

    tail_nodes = chunks[-1][1] if chunks[-1][0].startswith("__tail__") else []
    if tail_nodes:
        chunks = chunks[:-1]

    # ---- name definition map ------------------------------------------
    prelude_nodes = [n for n in tree.body if n.end_lineno <= PRELUDE_END]
    defined_in: dict[str, str] = {}  # name -> module stem (latest wins)
    for n in prelude_nodes:
        for name in node_names(n):
            defined_in[name] = "_shared"

    bnames = set(dir(builtins)) | {"__name__", "__file__", "__doc__"}

    def src_slice(nodes: list[ast.stmt], prev_end: int) -> tuple[str, int]:
        first = nodes[0]
        start = prev_end  # include comments/blank lines since prev node
        end = nodes[-1].end_lineno
        return "".join(lines[start:end]), end

    # ---- emit modules -------------------------------------------------
    PKG.mkdir(exist_ok=True)
    prev_end = PRELUDE_END
    module_order: list[str] = []
    problems: list[str] = []
    for stem, nodes in chunks:
        body, prev_end = src_slice(nodes, prev_end)
        local = set()
        for n in nodes:
            local.update(node_names(n))
        used = set()
        for n in nodes:
            for w in ast.walk(n):
                if isinstance(w, ast.Name) and isinstance(w.ctx, ast.Load):
                    used.add(w.id)
        deps = sorted(
            u for u in used if u not in local and u not in bnames and u in defined_in
        )
        unresolved = sorted(
            u
            for u in used
            if u not in local
            and u not in bnames
            and u not in defined_in
            and not u.startswith("__")
        )
        if unresolved:
            problems.append(f"{stem}: forward/unknown refs {unresolved}")
        by_mod: dict[str, list[str]] = {}
        for d in deps:
            by_mod.setdefault(defined_in[d], []).append(d)
        imports = []
        for mod in sorted(by_mod):
            names = ", ".join(sorted(by_mod[mod]))
            imp = f"from vectordb_migrator_spark.suite.{mod} import {names}"
            if len(imp) > 76:
                imp = (
                    f"from vectordb_migrator_spark.suite.{mod} import (\n    "
                    + ",\n    ".join(sorted(by_mod[mod]))
                    + ",\n)"
                )
            imports.append(imp)
        header = (
            f'"""Registry family ``{stem}`` — split from the monolithic\n'
            f"suite.py (round 8); registration order preserved via the\n"
            f'package ``__init__`` import sequence."""\n\n'
            "from __future__ import annotations\n\n"
            "# ruff: noqa: E501\n"
            + "\n".join(imports)
            + ("\n" if imports else "")
        )
        (PKG / f"{stem}.py").write_text(header + "\n" + body)
        module_order.append(stem)
        for name in local:
            defined_in[name] = stem

    # ---- _shared.py ---------------------------------------------------
    shared_src = "".join(lines[:PRELUDE_END])
    (PKG / "_shared.py").write_text(shared_src)

    # ---- __init__.py --------------------------------------------------
    tail_src = "".join(lines[tail_nodes[0].lineno - 1 - (tail_nodes[0].lineno - 1 - TAIL_BANNER + 1) :][: 0]) if False else "".join(
        lines[TAIL_BANNER - 2 : tail_nodes[-1].end_lineno]
    )
    init = (
        '"""The oracle-checked query suite — one entry per implemented\n'
        "operator, split into per-family modules. Importing this package\n"
        "registers every query in narrative order (module import order\n"
        "below IS the registration order the driver window depends on),\n"
        "then reorders the first 50 entries into the driver window.\n"
        "See ``_shared`` for registry conventions and helpers.\"\"\"\n\n"
        "from __future__ import annotations\n\n"
        "from vectordb_migrator_spark.suite._shared import (  # noqa: F401\n"
        "    ORACLES,\n    QUERIES,\n    QueryFn,\n    _PLANES,\n"
        "    _PLANES2,\n    _PROBE_SQL,\n    _probe_vector,\n    _t,\n"
        "    query,\n)\n\n"
        + "\n".join(
            f"from vectordb_migrator_spark.suite import {m}  # noqa: F401,E402"
            for m in module_order
        )
        + "\n\n"
        + tail_src
    )
    (PKG / "__init__.py").write_text(init)

    print("modules:", module_order)
    if problems:
        print("PROBLEMS:")
        for p in problems:
            print(" ", p)
    else:
        print("no unresolved refs")


if __name__ == "__main__":
    main()
