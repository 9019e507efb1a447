#!/usr/bin/env python3
"""Prune <outDir>/oracle_sql.json to gates whose output dir exists —
lets oracle_check.py run over a Verify dump restricted by gate names."""
import sys, json, os
out = sys.argv[1]
j = json.load(open(os.path.join(out, "oracle_sql.json")))
j = {k: v for k, v in j.items() if os.path.isdir(os.path.join(out, k))}
json.dump(j, open(os.path.join(out, "oracle_sql.json"), "w"))
print(f"kept {len(j)} gates")
