"""One-shot mechanical splitter for plans/breadth_queries.py (VERDICT r08
#7): moves each registered query block (its banner comment, family-local
helpers, @register decorator, and function) into a family module, keeping
line content byte-identical. Run once from the repo root; verify with
tools/gen_query_map.py + pytest afterwards, then delete or keep for
archaeology."""

from __future__ import annotations

import ast
import re

SRC = "aws_data_engineering_spark/plans/breadth_queries.py"

FAMILY_MODULES = [
    # (regex on query name, module filename, module docstring topic)
    (r"^dq", "quality_audit_queries.py", "data-quality audit queries (dq11-dq19 et al)"),
    (r"^(d|g)\d", "graphdedup_queries.py", "fuzzy-dedup and dedup-graph queries (d14-d21, g03-g09)"),
    (r"^st\d", "lakehouse_queries.py", None),
    (r"^(s|e)\d", "retrieval_queries.py", "similarity-search / embedding-audit queries (s09-s15, e08-e22)"),
    (r"^m\d", "codec_queries.py", "multimodal codec queries (m12-m24)"),
    (r"^c\d", "lakehouse_queries.py", "lakehouse source/sink/layout queries (c11-c21, st12-st13)"),
    (r"^t\d", "textstats_queries.py", "text-analysis queries (t21-t37)"),
    (r"^(q|p)\d", None, None),  # stays in breadth_queries.py
]

DOCSTRINGS = {
    "retrieval_queries.py": "Similarity-search and embedding-audit queries (the s/e families): ANN index shapes, retrieval fusion, embedding-health audits. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change).",
    "codec_queries.py": "Multimodal codec queries (the m family): real image/audio/container decoders exercised through Arrow map stages. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change).",
    "lakehouse_queries.py": "Lakehouse source/sink/layout queries (the c family plus their streaming twins st12/st13): layout writes, pruning audits, manifests, format round-trips. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change).",
    "textstats_queries.py": "Text-analysis queries (the t family): LM scoring, tokenizer training, retrieval stats, langid. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change).",
    "graphdedup_queries.py": "Fuzzy-dedup and dedup-graph queries (the d/g families): candidate-pair generation, cluster resolution, graph algorithms over near-dup edges. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change).",
    "quality_audit_queries.py": "Data-quality audit queries (the dq family): drift, outliers, checksums, reconciliation. Split out of breadth_queries.py in round 9 (mechanical move; no semantic change).",
}


def module_for(qname: str) -> str | None:
    for rx, mod, _ in FAMILY_MODULES:
        if re.match(rx, qname):
            return mod
    raise ValueError(f"unclassified query {qname}")


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    qnames = set(re.findall(r'@register\(\s*\n?\s*"([a-z0-9_]+)"', src))

    # prelude = docstring + imports + the shared _t loader; chunks start
    # right after _t's def and every later line belongs to some query chunk
    t_def = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "_t"
    )
    prelude_end = t_def.end_lineno

    # ordered (query_name, chunk_start_line, chunk_end_line) 1-based inclusive
    chunks: list[tuple[str, int, int]] = []
    prev_end = prelude_end
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in qnames:
            start = prev_end + 1
            chunks.append((node.name, start, node.end_lineno))
            prev_end = node.end_lineno
    tail = "".join(lines[prev_end:])
    assert not tail.strip(), f"unexpected tail after last query:\n{tail[:500]}"

    prelude = "".join(lines[:prelude_end])

    # helper-name ownership: names defined inside chunk -> target module
    def chunk_text(c):
        return "".join(lines[c[1] - 1 : c[2]])

    defined: dict[str, str] = {}
    for c in chunks:
        mod = module_for(c[0])
        t = chunk_text(c)
        for m in re.finditer(r"^(?:def (\w+)|(_[A-Z0-9_]+) =)", t, re.M):
            nm = m.group(1) or m.group(2)
            if nm != c[0]:
                defined[nm] = mod or "breadth_queries.py"

    # cross-module reference audit
    bad = []
    for c in chunks:
        mod = module_for(c[0]) or "breadth_queries.py"
        t = chunk_text(c)
        for nm, owner in defined.items():
            if owner != mod and re.search(rf"\b{re.escape(nm)}\b", t):
                # ignore the defining chunk itself
                if re.search(rf"^(?:def {re.escape(nm)}\b|{re.escape(nm)} =)", t, re.M):
                    continue
                bad.append((c[0], nm, owner, mod))
    if bad:
        print("CROSS-MODULE REFERENCES (fix before splitting):")
        for q, nm, owner, mod in bad:
            print(f"  {q} (-> {mod}) uses {nm} (defined in {owner})")
        raise SystemExit(1)

    # emit modules
    out: dict[str, list[str]] = {}
    for c in chunks:
        mod = module_for(c[0])
        key = mod or "breadth_queries.py"
        out.setdefault(key, []).append(chunk_text(c))

    base = "aws_data_engineering_spark/plans/"
    # imports common to all emitted modules: the breadth prelude minus its
    # module docstring, plus the mid-file imports some chunks rely on
    prelude_body = prelude.split('"""')[-1].lstrip("\n") if '"""' in prelude else prelude
    extra_imports = (
        "from aws_data_engineering_spark.operators import multimodal as MM  # noqa: E402,F401\n"
        "from aws_data_engineering_spark.operators.similarity import pq_oracle_sql as _pq_sql  # noqa: E402,F401\n"
        "from aws_data_engineering_spark.operators.text import cdc_sql_cte as _cdc_cte  # noqa: E402,F401\n"
    )
    for mod, texts in out.items():
        if mod == "breadth_queries.py":
            body = prelude + "".join(texts)
            open(base + mod, "w").write(body)
        else:
            doc = DOCSTRINGS[mod]
            body = (
                f'"""{doc}"""\n\n'
                + prelude_body
                + extra_imports
                + "\n\n"
                + "".join(texts)
            )
            open(base + mod, "w").write(body)
        n = len(texts)
        print(f"{mod}: {n} queries, {body.count(chr(10))} lines")


if __name__ == "__main__":
    main()
