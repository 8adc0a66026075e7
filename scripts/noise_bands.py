"""Rewrite the 'Per-query noise bands' table in BENCH/BASELINE.md from
BENCH/history.jsonl (VERDICT r04 #8: regression calls must be decidable
from the artifact alone — a single bench run on this host is noise)."""
import json
import re
import statistics as st
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def bands():
    rows = [json.loads(l) for l in open(ROOT / "BENCH/history.jsonl")]
    qs: dict[str, list[float]] = {}
    totals = []
    for r in rows:
        totals.append(r.get("value"))
        for k, v in r.get("queries", {}).items():
            qs.setdefault(k, []).append(v)
    return len(rows), qs, [t for t in totals if t]


def table() -> str:
    n, qs, totals = bands()
    out = [f"## Per-query noise bands (all-rounds history, {n} runs)",
           "",
           "The sandbox host swings 3-4x minute-to-minute (see 'Measured host",
           "noise' in PLANS.md), so a single run can NOT establish a regression.",
           "Bands below are best / median / worst per query across every",
           "BENCH/history.jsonl line recorded so far (VERDICT r04 #8): a new",
           "measurement inside its band is noise; only a value past the recorded",
           "worst — or a median shift across several runs — is a real change.",
           "",
           "| query | n | best s | median s | worst s |",
           "|---|---|---|---|---|"]
    for k, v in qs.items():
        out.append(f"| {k} | {len(v)} | {min(v):.3f} | {st.median(v):.3f} | {max(v):.3f} |")
    out.append(f"| **total** | {len(totals)} | {min(totals):.3f} | "
               f"{st.median(totals):.3f} | {max(totals):.3f} |")
    out.append("")
    out.append("Regeneration: `python scripts/noise_bands.py` rewrites this table")
    out.append("from the current history file.")
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    p = ROOT / "BENCH/BASELINE.md"
    text = p.read_text()
    # replace ONLY the noise-band section: stop at the next '## '
    # heading so sections appended after the table (e.g. the same-host
    # A/B regression control) survive regeneration
    new = re.sub(r"## Per-query noise bands.*?(?=\n## |\Z)",
                 table(), text, flags=re.S)
    if "## Per-query noise bands" not in text:
        new = text.rstrip() + "\n\n" + table()
    p.write_text(new)
    print("BENCH/BASELINE.md noise bands updated")
