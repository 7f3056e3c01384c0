"""Rebuild a MEASURE_r*.jsonl ledger's `result` fields from its .log.

The round-4 driver's `echo | python - <<EOF` pipe was silently discarded
(heredoc wins stdin), leaving every row's result empty; the .log kept each
arm's full output. This joins the log's per-arm last JSON line back onto
the ledger rows (rc/wall_s preserved). Idempotent.

Usage: python tools_backfill_measure.py MEASURE_r4.jsonl [MEASURE_r4.log]
"""
import json
import re
import sys


def main(jsonl_path, log_path=None):
    log_path = log_path or jsonl_path.replace(".jsonl", ".log")
    arms: dict[str, str] = {}
    cur = None
    for line in open(log_path):
        m = re.match(r"^=== (\S+): ", line)
        if m:
            cur = m.group(1)
            arms.setdefault(cur, "")
            continue
        if cur and line.startswith("{"):
            arms[cur] = line.strip()
    rows = []
    for line in open(jsonl_path):
        row = json.loads(line)
        if not row.get("result"):
            raw = arms.get(row["arm"], "")
            try:
                row["result"] = json.loads(raw)
            except Exception:
                row["result"] = raw[-400:]
        rows.append(row)
    with open(jsonl_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"backfilled {sum(1 for r in rows if r['result'])}/{len(rows)} rows")


if __name__ == "__main__":
    main(*sys.argv[1:])
