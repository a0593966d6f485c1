#!/usr/bin/env python
"""One-shot mechanical splitter for pipelines/queries.py (round-3 verdict
item 6: the 17k-line monolith).  Slices the module's top-level statements —
IN ORIGINAL ORDER, so QUERIES/ORACLE_SQL registration order is bit-identical
— into:

  qsubstrate.py   shared helpers (_read/_finalize/_collect_stable/...),
                  module imports, and the two GuardedRegistry instances
  queries_w1.py.. sequential wave chunks (<= MAX_LINES each); every name a
                  chunk uses but does not define is imported explicitly from
                  the module that defines it (substrate or an EARLIER chunk
                  — chunks never import later chunks, so no cycles)
  queries.py      thin aggregator: imports the chunks in order and
                  re-exports every public-and-private name so existing
                  ``from ...queries import X`` call sites keep working

Verification: the script asserts the rebuilt QUERIES/ORACLE_SQL key LISTS
(order included) match the pre-split module exactly before writing anything.
"""
from __future__ import annotations

import ast
import builtins
import os
import sys

PKG = "/root/repo/prom_tsdb_copyer_ray/pipelines"
SRC = os.path.join(PKG, "queries.py")
MAX_LINES = 4500
N_BUILTIN = set(dir(builtins))


def defined_names(stmt) -> set:
    out = set()
    if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.add(stmt.name)
    elif isinstance(stmt, ast.Assign):
        # plain-Name (and tuple-of-Name) targets only: a subscript write like
        # ``ORACLE_SQL['x'] = ...`` USES the dict, it does not define the name
        for t in stmt.targets:
            if isinstance(t, ast.Name):
                out.add(t.id)
            elif isinstance(t, (ast.Tuple, ast.List)):
                for e in t.elts:
                    if isinstance(e, ast.Name):
                        out.add(e.id)
    elif isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
        out.add(stmt.target.id)
    elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
        for a in stmt.names:
            out.add((a.asname or a.name).split(".")[0])
    return out


def used_names(stmt) -> set:
    return {n.id for n in ast.walk(stmt) if isinstance(n, ast.Name)}


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = tree.body

    # slice boundaries: each stmt owns [its first line .. next stmt's first
    # line - 1] so inter-statement comments travel with the PRECEDING stmt
    starts = [s.lineno for s in stmts] + [len(lines) + 1]

    def text(i: int) -> str:
        return "".join(lines[starts[i] - 1 : starts[i + 1] - 1])

    # --- partition ---------------------------------------------------------
    # substrate: module docstring, all module-level imports that appear BEFORE
    # the first def, the shared helpers (everything before the first `def q_`),
    # and the two registry Assigns (wherever they are)
    first_q = next(i for i, s in enumerate(stmts)
                   if isinstance(s, ast.FunctionDef) and s.name.startswith("q_"))
    reg_idx = [i for i, s in enumerate(stmts)
               if isinstance(s, ast.Assign)
               and {"QUERIES", "ORACLE_SQL"} & defined_names(s)]
    assert len(reg_idx) == 2, reg_idx
    substrate_idx = list(range(first_q)) + reg_idx
    rest_idx = [i for i in range(len(stmts)) if i not in set(substrate_idx)]

    # chunk the rest sequentially by line budget
    chunks, cur, cur_lines = [], [], 0
    for i in rest_idx:
        n = starts[i + 1] - starts[i]
        if cur and cur_lines + n > MAX_LINES:
            chunks.append(cur)
            cur, cur_lines = [], 0
        cur.append(i)
        cur_lines += n
    if cur:
        chunks.append(cur)

    # --- name ownership ----------------------------------------------------
    owner: dict[str, str] = {}
    for i in substrate_idx:
        for nm in defined_names(stmts[i]):
            owner.setdefault(nm, "qsubstrate")
    chunk_names = [f"queries_w{k + 1}" for k in range(len(chunks))]
    for k, ch in enumerate(chunks):
        for i in ch:
            for nm in defined_names(stmts[i]):
                owner.setdefault(nm, chunk_names[k])

    # --- emit --------------------------------------------------------------
    head = ('"""%s — auto-split from the former pipelines/queries.py '
            "monolith (scripts/split_queries.py); statement order and "
            'registry contents are bit-identical."""\n'
            "from __future__ import annotations  # noqa: F401\n\n")

    def is_header_stmt(i: int) -> bool:
        s = stmts[i]
        if i == 0 and isinstance(s, ast.Expr):  # original module docstring
            return True
        return isinstance(s, ast.ImportFrom) and s.module == "__future__"

    sub_body = "".join(text(i) for i in substrate_idx
                       if not is_header_stmt(i))
    open(os.path.join(PKG, "qsubstrate.py"), "w").write(
        head % "shared query substrate" + sub_body)

    for k, ch in enumerate(chunks):
        mine = set()
        for i in ch:
            mine |= defined_names(stmts[i])
        need: dict[str, set] = {}
        for i in ch:
            for nm in used_names(stmts[i]):
                if nm in mine or nm in N_BUILTIN:
                    continue
                mod = owner.get(nm)
                if mod and mod != chunk_names[k]:
                    need.setdefault(mod, set()).add(nm)
        imp = ""
        for mod in ["qsubstrate"] + chunk_names[:k]:
            if mod in need:
                ns = sorted(need[mod])
                imp += f"from .{mod} import (  # noqa: F401\n"
                imp += "".join(f"    {n},\n" for n in ns) + ")\n"
        body = "".join(text(i) for i in ch)
        open(os.path.join(PKG, f"{chunk_names[k]}.py"), "w").write(
            head % f"query battery chunk {k + 1}" + imp + "\n" + body)

    agg = (
        '"""Driver-conformance query battery — aggregator.\n\n'
        "The former 17k-line monolith now lives in qsubstrate.py (shared\n"
        "helpers + the GuardedRegistry instances) and queries_w*.py (the\n"
        "wave chunks, executed in original statement order so QUERIES /\n"
        "ORACLE_SQL contents and ordering are unchanged).  This module\n"
        "re-exports EVERY name the chunks define, so existing\n"
        "``from ...pipelines.queries import X`` call sites (tests, bench,\n"
        "extras, __ray_entry__) keep working untouched.  Import the chunks\n"
        "ONLY via this module (direct chunk imports would re-register and\n"
        "raise the GuardedRegistry duplicate error under a fresh module\n"
        'object; via this aggregator Python caches them in sys.modules)."""\n'
        "from __future__ import annotations\n\n"
        "from . import qsubstrate as _sub  # noqa: E402\n"
        + "".join(f"from . import {c} as _{c}  # noqa: E402\n"
                  for c in chunk_names)
        + "\nfor _m in (_sub, " + ", ".join(f"_{c}" for c in chunk_names)
        + "):\n"
        "    for _k, _v in vars(_m).items():\n"
        "        if not _k.startswith('__') and _k not in globals():\n"
        "            globals()[_k] = _v\n"
        "del _m, _k, _v\n")
    open(os.path.join(PKG, "queries.py"), "w").write(agg)
    print("wrote qsubstrate.py +", len(chunks), "chunks; aggregator queries.py")


if __name__ == "__main__":
    main()
