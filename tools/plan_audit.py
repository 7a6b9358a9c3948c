#!/usr/bin/env python3
"""Summarize graft.PlanDump output: per-query operator census.

Usage: python3 tools/plan_audit.py plans/r20 [suffix]

Prints one line per plan file: Exchange count, join strategies, scan
count, pushed-filter presence, codegen span count, suspicious nodes
(CartesianProduct, non-codegen'd filters/projects) — the bulk audit the
optimization guide §7.2 asks for, greppable/sortable.
"""
import os, re, sys, collections

def audit(path):
    txt = open(path, encoding="utf-8").read()
    c = collections.OrderedDict()
    c["exch"] = len(re.findall(r"\bExchange\b", txt))
    c["bcast_exch"] = len(re.findall(r"BroadcastExchange", txt))
    c["bhj"] = len(re.findall(r"BroadcastHashJoin", txt))
    c["smj"] = len(re.findall(r"SortMergeJoin", txt))
    c["shj"] = len(re.findall(r"ShuffledHashJoin", txt))
    c["bnlj"] = len(re.findall(r"BroadcastNestedLoopJoin", txt))
    c["cart"] = len(re.findall(r"CartesianProduct", txt))
    c["scan"] = len(re.findall(r"Scan parquet|FileScan parquet", txt))
    c["sort"] = len(re.findall(r"\bSort \[", txt)) + len(re.findall(r"\(\d+\) Sort\b", txt))
    c["agg"] = len(re.findall(r"HashAggregate", txt))
    c["objagg"] = len(re.findall(r"ObjectHashAggregate", txt))
    c["sortagg"] = len(re.findall(r"SortAggregate", txt))
    c["win"] = len(re.findall(r"\bWindow\b", txt))
    c["gen"] = len(re.findall(r"\bGenerate\b", txt))
    c["wsc"] = len(re.findall(r"WholeStageCodegen", txt))
    c["rdd"] = len(re.findall(r"Scan ExistingRDD|LogicalRDD|MapPartitions|SerializeFromObject", txt))
    c["pushed"] = len(re.findall(r"PushedFilters: \[[^\]]", txt))
    c["inmem"] = len(re.findall(r"InMemoryTableScan", txt))
    c["aqe"] = len(re.findall(r"AdaptiveSparkPlan", txt))
    return c

def main():
    d = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    rows = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(f"_{suffix}.txt"):
            continue
        name = f[: -len(f"_{suffix}.txt")]
        rows.append((name, audit(os.path.join(d, f))))
    if not rows:
        print("no plan files found", file=sys.stderr)
        return
    keys = list(rows[0][1].keys())
    print("query".ljust(36) + " ".join(k.rjust(10 if k == "bcast_exch" else 7) for k in keys))
    for name, c in rows:
        print(name.ljust(36) + " ".join(str(c[k]).rjust(10 if k == "bcast_exch" else 7) for k in keys))

if __name__ == "__main__":
    main()
