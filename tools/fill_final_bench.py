#!/usr/bin/env python
"""Fill OPTIMIZATION_r12.md's FINAL column + final-re-measure section from
bench_r12_final.json (one-shot doc tool, round 12)."""
import json
import re

doc_path = "OPTIMIZATION_r12.md"
final = json.load(open("bench_r12_final.json"))
base = json.load(open("bench_r12_baseline.json"))

text = open(doc_path).read()

missing = []
for name, sec in final["queries"].items():
    pat = re.compile(r"^(\| %s \| [0-9.]+ \|) FINAL (\|.*)$" % re.escape(name), re.M)
    text, n = pat.subn(r"\g<1> %.2f \g<2>" % sec, text)
    if n == 0:
        missing.append(name)

left = re.findall(r"^\| (\S+) \| [0-9.]+ \| FINAL \|", text, re.M)

total_final = final["value"]
total_base = base["value"]
common = [q for q in final["queries"] if q in base["queries"]]
sum_final_common = sum(final["queries"][q] for q in common)
sum_base_common = sum(base["queries"][q] for q in common)
opt_rows = {
    "llm_minhash_near_dup_pairs", "llm_dedup_clusters", "llm_dedup_rate_trend",
    "llm_dedup_cluster_size_histogram", "llm_quality_dedup_crosstab",
    "str_streaming_near_dup", "llm_boilerplate_ngrams",
    "llm_substring_dedup_spans", "llm_substring_dedup_apply",
    "llm_winnowing_fingerprints", "llm_ivf_cell_probe_nprobe",
    "llm_ivf_cell_rebalance", "llm_ivf_probe_rebalanced",
}
sum_opt_base = sum(base["queries"][q] for q in opt_rows if q in base["queries"])
sum_opt_final = sum(final["queries"][q] for q in opt_rows if q in final["queries"])

section = f"""Final quiet run (`bench_r12_final.json`, committed): **{total_final:.2f} s /
{len(final['queries'])} queries** vs the inherited-tree baseline
`bench_r12_baseline.json` **{total_base:.2f} s / {len(base['queries'])}** on the same box, same
methodology — **{100 * (1 - total_final / total_base):.1f}% faster end-to-end**. The 13 plan-changed
rows alone: {sum_opt_base:.2f} -> {sum_opt_final:.2f} s ({100 * (1 - sum_opt_final / sum_opt_base):.1f}% reduction); the flat/
non-change tail moved only within its documented noise band.

Quiet-run discipline note (the BENCH_r11 lesson, applied): the FIRST
final-run attempt came back 119.39 s with every UNTOUCHED flat row
uniformly +30-50% (llm_bpe_train 2.33->5.78, ag_cohens_kappa
1.54->2.36, jn_triangle_count 0.54->1.02 — none of their plans changed
this round) while all 13 optimized rows still showed their wins — the
drift signature, not a regression. It is committed as
`bench_r12_drifted.json` for the record, and the quiet re-run above
(verified zero steal time, load < 0.3 at launch) is the anchor.

Correctness after all changes: full pytest suite green (538 passed,
1 skipped — the documented protobuf-absent leg) and two full 339-query
contract sweeps against the DuckDB oracle, all hash-green."""

text = text.replace("FINAL_SECTION", section)
open(doc_path, "w").write(text)
print("filled:", len(final["queries"]) - len(missing), "missing-in-doc:", missing, "left-unfilled:", left)
print("totals: base %.2f final %.2f  common %.2f->%.2f  opt %.2f->%.2f" % (
    total_base, total_final, sum_base_common, sum_final_common, sum_opt_base, sum_opt_final))
