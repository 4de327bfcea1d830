#!/usr/bin/env python3
"""Diff two bench artifacts: plan-shape changes first, then timing moves.

The `plan_nodes` channel (round 16) records each query's executed-plan
node counts; a shape change (new exchange, broadcast -> sort-merge flip,
lost codegen span) is almost always the CAUSE of a timing move, so this
prints shape diffs before steady-time diffs.

Usage: tools/plan_diff.py <old_artifact.json> <new_artifact.json> [top_n]
"""
import json, sys

def parse_sig(s):
    return dict(kv.split("=") for kv in s.split(",") if "=" in kv) if s else {}

def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    oq, nq = old.get("queries", {}), new.get("queries", {})
    op, np_ = old.get("plan_nodes", {}), new.get("plan_nodes", {})

    print(f"old total {old.get('value', 0):.1f}s ({len(oq)} rows)  "
          f"new total {new.get('value', 0):.1f}s ({len(nq)} rows)")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))

    shape = []
    for q in sorted(set(op) & set(np_)):
        a, b = parse_sig(op[q]), parse_sig(np_[q])
        if a != b:
            delta = {k: f"{a.get(k, '0')}->{b.get(k, '0')}"
                     for k in sorted(set(a) | set(b))
                     if a.get(k, "0") != b.get(k, "0")}
            shape.append((q, delta))
    if shape:
        print(f"\nplan-shape changes ({len(shape)}):")
        for q, d in shape:
            print(f"  {q:40} {d}")
    elif op and np_:
        print("\nno plan-shape changes")

    moves = sorted(((q, oq[q], nq[q]) for q in set(oq) & set(nq)),
                   key=lambda t: abs(t[2] - t[1]), reverse=True)[:top_n]
    print(f"\nlargest steady moves (top {top_n}):")
    for q, a, b in moves:
        print(f"  {q:40} {a:7.2f} -> {b:7.2f}  ({b - a:+.2f})")

if __name__ == "__main__":
    main()
