"""One-shot mechanical splitter for __spark_entry__.py (verdict-r8
task 8): moves the 197 query functions + their oracle SQL constants
into family modules under entry_queries/, leaving __spark_entry__.py
as the thin composing driver contract (entry / queries / oracle_sql).

Pure refactor: every top-level item's source text is moved VERBATIM
(including its preceding comment block); nothing is rewritten. Items
referenced by more than one family land in entry_queries/_shared.py.
Each module gets an explicit __all__ (wildcard import must re-export
the _UNDERSCORE SQL constants), and __spark_entry__ wildcard-imports
every module so external references (tests, scripts) keep working.

Run from the repo root: python scripts/split_entry.py
Verify afterwards: import __spark_entry__; same 197 keys, same oracle
keys; then the full pytest + oracle mirror.
"""

from __future__ import annotations

import ast
import re
from collections import defaultdict
from pathlib import Path

SRC_PATH = Path("__spark_entry__.py")
PKG = Path("entry_queries")

FAMILIES = ("relational", "events", "text", "embedding", "maintenance")

# registry-key -> family classification, ordered rules (first hit wins)
RULES = [
    # maintenance: streaming MVs, sinks, side-effecting table ops
    (r"^(merge_upsert|production_daily_loop|compacted_snapshot|"
     r"indexed_zorder_scan|incremental_join_mv|join_mv_|"
     r"text_formats_roundtrip|mv_routed_revenue|replica_drift_audit|"
     r"cast_decimal_policy|scd2_customer_history|orders_pit_dimension)",
     "maintenance"),
    # events-table analytics (sessionization, funnels, attribution)
    (r"^(events_|event_|user_|session|concurrent_sessions|"
     r"purchase_last_click|multi_touch_attribution|conversion_latency|"
     r"dau_mau_stickiness|time_weighted_value|purchase_survival_km|"
     r"error_context_views|sketch_rollup|sketch_stats)", "events"),
    # embeddings / vectors / multimodal
    (r"^(emb_|semantic_dedup|knn_label_accuracy|media_phash_pairs|"
     r"multimodal_)", "embedding"),
    # documents / near-dup / text retrieval / LM stats
    (r"^(doc_|neardup_|bpe_|term_pmi|vocab_topk|phrase_search|"
     r"inverted_index|bm25_search|duplicate_spans|cluster_canonicalize|"
     r"split_leakage|fuzzy_code_match|source_overlap|source_mix_sample|"
     r"lang_id_eval|column_entropy)", "text"),
    # everything else: TPC-H-ish relational + stats over those tables
    (r".", "relational"),
]

# these stay in the root __spark_entry__.py
KEEP_IN_ROOT = {"entry", "queries", "oracle_sql", "SF_SMOKE"}


def family_of(key: str) -> str:
    for pat, fam in RULES:
        if re.match(pat, key):
            return fam
    raise AssertionError(key)


def main() -> None:
    src = SRC_PATH.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # ---- collect top-level items with attached leading comment gap ----
    items = []  # (name, start_line, end_line) 1-based inclusive
    module_doc_end = 0
    body = tree.body
    if isinstance(body[0], ast.Expr) and isinstance(
        body[0].value, ast.Constant
    ):
        module_doc_end = body[0].end_lineno
        body = body[1:]
    # import block: contiguous leading imports
    import_nodes = []
    rest = []
    for node in body:
        if isinstance(node, (ast.Import, ast.ImportFrom)) and not rest:
            import_nodes.append(node)
        else:
            rest.append(node)
    import_start = import_nodes[0].lineno
    import_end = import_nodes[-1].end_lineno
    import_block = "".join(lines[import_start - 1:import_end])

    def node_name(node):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            return node.name
        if isinstance(node, ast.Assign) and len(node.targets) == 1 and \
                isinstance(node.targets[0], ast.Name):
            return node.targets[0].id
        if isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            return node.target.id
        if isinstance(node, ast.Expr):
            return None  # stray docstring/comment expr: attach to next
        raise AssertionError(
            f"unhandled top-level node at line {node.lineno}: "
            f"{type(node).__name__}"
        )

    prev_end = import_end
    pending_gap_start = None
    for node in rest:
        name = node_name(node)
        start = node.lineno
        # attach decorator lines
        if hasattr(node, "decorator_list") and node.decorator_list:
            start = min(d.lineno for d in node.decorator_list)
        gap_start = prev_end + 1  # comments/blank lines before the item
        if pending_gap_start is not None:
            gap_start = pending_gap_start
            pending_gap_start = None
        if name is None:
            # stray Expr (interior docstring): fold into the next item
            pending_gap_start = gap_start
            prev_end = node.end_lineno
            continue
        items.append((name, gap_start, start, node.end_lineno, node))
        prev_end = node.end_lineno

    names = {it[0] for it in items}
    by_name = {it[0]: it for it in items}

    # ---- reference graph over top-level names ----
    refs = {}
    for name, _g, _s, _e, node in items:
        used = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name) and sub.id in names and \
                    sub.id != name:
                used.add(sub.id)
        refs[name] = used

    # ---- leaf classification from the queries() registry ----
    qdict = {}
    for sub in ast.walk(by_name["queries"][4]):
        if isinstance(sub, ast.Dict):
            for k, v in zip(sub.keys, sub.values):
                assert isinstance(v, ast.Name), ast.dump(v)
                qdict[k.value] = v.id
            break
    assert len(qdict) >= 190, len(qdict)

    fam_of_item: dict[str, set] = defaultdict(set)
    # seed: each q-function gets its key's family
    for key, fn in qdict.items():
        fam_of_item[fn].add(family_of(key))
    # oracle_sql values: names referenced there belong with their query.
    # (handled by propagation below: oracle_sql stays in root and refs
    # everything, so exclude root items from propagation sources)

    # propagate: an item used (transitively) by family leaves joins
    # those families. BFS from each seeded leaf through refs.
    seeds = dict(fam_of_item)
    for fn, fams in seeds.items():
        stack = [fn]
        seen = set()
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            fam_of_item[cur] |= fams
            for dep in refs.get(cur, ()):
                if dep not in KEEP_IN_ROOT:
                    stack.append(dep)

    # oracle SQL constants not referenced by any q_ function are
    # referenced only from oracle_sql() (root). Assign each to the
    # family of the query key it serves, by matching the oracle dict.
    oracle_pairs = []  # (key, value-expression root names)
    for sub in ast.walk(by_name["oracle_sql"][4]):
        if isinstance(sub, ast.Dict):
            for k, v in zip(sub.keys, sub.values):
                vnames = {
                    n.id for n in ast.walk(v)
                    if isinstance(n, ast.Name) and n.id in names
                }
                oracle_pairs.append((k.value, vnames))
            break
    for key, vnames in oracle_pairs:
        fam = family_of(key)
        for vn in vnames:
            stack = [vn]
            seen = set()
            while stack:
                cur = stack.pop()
                if cur in seen or cur in KEEP_IN_ROOT:
                    continue
                seen.add(cur)
                fam_of_item[cur].add(fam)
                stack.extend(refs.get(cur, ()))

    # ---- final placement ----
    placement = {}
    for name, *_ in items:
        if name in KEEP_IN_ROOT:
            placement[name] = "root"
        else:
            fams = fam_of_item.get(name, set())
            if len(fams) == 1:
                placement[name] = next(iter(fams))
            elif len(fams) > 1:
                placement[name] = "_shared"
            else:
                # unreferenced from any leaf (helpers used only by root,
                # e.g. _scratch_dir callers... ) -> shared
                placement[name] = "_shared"

    # a family item referencing a DIFFERENT family's item forces that
    # dep into _shared (iterate to fixpoint)
    changed = True
    while changed:
        changed = False
        for name, deps in refs.items():
            p = placement[name]
            if p in ("root",):
                continue
            for d in deps:
                pd = placement[d]
                if pd in ("root", "_shared"):
                    continue
                if p == "_shared" or pd != p:
                    if placement[d] != "_shared":
                        placement[d] = "_shared"
                        changed = True

    # ---- emit ----
    PKG.mkdir(exist_ok=True)
    header_note = (
        '"""%s queries split out of __spark_entry__.py (round 9) — '
        "see that module's docstring for the driver contract. "
        'Mechanically moved, text verbatim."""\n\n'
    )
    mod_items = defaultdict(list)
    for it in items:
        mod_items[placement[it[0]]].append(it)

    (PKG / "__init__.py").write_text(
        '"""Query-registry families composed by __spark_entry__.py."""\n'
    )

    counts = {}
    for mod in ("_shared",) + FAMILIES:
        its = mod_items.get(mod, [])
        counts[mod] = len(its)
        parts = [header_note % (mod.strip("_") or mod)]
        parts.append(import_block)
        if mod != "_shared":
            parts.append("\nfrom ._shared import *  # noqa: F401,F403\n")
        for name, gap_start, start, end, _node in its:
            gap = "".join(lines[gap_start - 1:start - 1])
            parts.append("\n" + gap + "".join(lines[start - 1:end]))
        allnames = ",\n    ".join(
            repr(n) for n, *_ in its
        )
        parts.append(f"\n\n__all__ = [\n    {allnames},\n]\n")
        (PKG / f"{mod}.py").write_text("".join(parts))

    # ---- new root module ----
    root_parts = ["".join(lines[:module_doc_end]), "\n", import_block]
    root_parts.append(
        "\n# Query families (round-9 split): each module holds its "
        "q_ functions\n# and oracle SQL verbatim; this module composes "
        "the registry.\n"
        "from entry_queries._shared import *  # noqa: F401,F403,E402\n"
    )
    for fam in FAMILIES:
        root_parts.append(
            f"from entry_queries.{fam} import *  # noqa: F401,F403,E402\n"
        )
    for name in ("SF_SMOKE", "entry", "queries", "oracle_sql"):
        _n, gap_start, start, end, _node = by_name[name]
        gap = "".join(lines[gap_start - 1:start - 1])
        root_parts.append("\n" + gap + "".join(lines[start - 1:end]))
    SRC_PATH.write_text("".join(root_parts))

    print("placement counts:", dict(counts),
          "root:", sum(1 for p in placement.values() if p == "root"))


if __name__ == "__main__":
    main()
