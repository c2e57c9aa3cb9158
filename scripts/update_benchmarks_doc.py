"""Regenerate docs/BENCHMARKS.md's headline block from a BENCH_r*.json.

The headline numbers in docs/BENCHMARKS.md live between AUTOGEN markers and
are RENDERED from a bench artifact, never hand-edited — hand-synced copies
drifted from the artifacts twice (rounds 3 and 4).  The block names its
source artifact; tests/test_quality.py re-renders from that artifact and
fails if the committed block disagrees (so a number can't be typo'd or go
stale against the artifact it claims to report).

Usage:
    python scripts/update_benchmarks_doc.py            # newest BENCH_r*.json
    python scripts/update_benchmarks_doc.py BENCH_r05.json
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOC = REPO / "docs" / "BENCHMARKS.md"
BEGIN = "<!-- BENCH_HEADLINE_AUTOGEN source="
END = "<!-- BENCH_HEADLINE_AUTOGEN_END -->"


def newest_artifact() -> Path:
    arts = sorted(REPO.glob("BENCH_r*.json"))
    if not arts:
        raise SystemExit("no BENCH_r*.json artifacts found")
    return arts[-1]


def render(artifact_name: str) -> str:
    """The autogen block for ``artifact_name`` (repo-root-relative)."""
    data = json.loads((REPO / artifact_name).read_text())
    # the round driver wraps bench.py's JSON line under "parsed"
    data = data.get("parsed", data)
    lines = [
        f"{BEGIN}{artifact_name} — rendered by "
        "scripts/update_benchmarks_doc.py; do NOT hand-edit -->",
        "",
        f"- Scan-path throughput: **{data['value']:,.1f} leapfrog"
        f" grad-steps/sec** = {data['vs_baseline']:.1f}x the 10k north star"
        f" (median-of-3, rel. spread {data['scan_rel_spread']:.3f});"
        f" **{data['tflops']:.1f} TFLOP/s, MFU {data['mfu']:.3f}** of v5e"
        f" bf16 peak.",
    ]
    if data.get("fused_kernel_grad_steps_per_sec"):
        lines.append(
            f"- Fused Pallas kernel, same model shape: "
            f"**{data['fused_kernel_grad_steps_per_sec']:,.1f}"
            f" grad-steps/sec**."
        )
    if data.get("chees_min_ess_per_sec"):
        chees = (
            f"- ChEES-HMC steady-state sampling efficiency: "
            f"**{data['chees_min_ess_per_sec']:,.1f} min-ESS/sec**"
            f" (p10 {data['chees_p10_ess_per_sec']:,.1f}, acceptance"
            f" {data['chees_acc_rate']:.3f}"
        )
        if data.get("chees_wall_rel_spread") is not None:
            chees += (
                f"; wall rel. spread {data['chees_wall_rel_spread']:.3f},"
                f" fixed-seed ESS spread {data['chees_ess_seed_spread']:.3f}"
            )
        elif data.get("chees_rel_spread") is not None:
            chees += f"; rel. spread {data['chees_rel_spread']:.3f}"
        lines.append(chees + ").")
    if data.get("rmhmc_grad_steps_per_sec"):
        lines.append(
            f"- Batched softabs RMHMC (64 chains, D=64, non-constant"
            f" curvature): **{data['rmhmc_grad_steps_per_sec']:,.1f}"
            f" implicit-leapfrog grad-steps/sec**."
        )
    if data.get("mclmc_grad_steps_per_sec"):
        mclmc = (
            f"- MCLMC (unadjusted, auto-tuned, 64 chains on the flagship"
            f" BNN): **{data['mclmc_grad_steps_per_sec']:,.1f}"
            f" grad-steps/sec**"
        )
        if data.get("mclmc_min_ess_per_sec"):
            mclmc += (
                f", **{data['mclmc_min_ess_per_sec']:,.1f} min-ESS/sec**"
            )
        if data.get("mclmc_rel_spread") is not None:
            mclmc += f" (rel. spread {data['mclmc_rel_spread']:.3f})"
        lines.append(mclmc + ".")
    if data.get("mclmc_fused_grad_steps_per_sec"):
        fused_mc = (
            f"- Fused Pallas MCLMC kernel (same posterior, warm-started at"
            f" the XLA phase's tuned state and median tuned (eps, L)): "
            f"**{data['mclmc_fused_grad_steps_per_sec']:,.1f}"
            f" grad-steps/sec**"
        )
        if data.get("mclmc_fused_rel_spread") is not None:
            fused_mc += (
                f" (rel. spread {data['mclmc_fused_rel_spread']:.3f}"
            )
            if data.get("mclmc_fused_var_e") is not None:
                fused_mc += (
                    f"; realised E[dE^2]/d {data['mclmc_fused_var_e']:.2e}"
                )
            fused_mc += ")"
        lines.append(fused_mc + ".")
    if data.get("compile_s"):
        comp = ", ".join(
            f"{k} {v:.1f}s" for k, v in sorted(data["compile_s"].items())
        )
        lines.append(f"- Compile cost per phase (axon remote compile): {comp}.")
    lines += ["", END]
    return "\n".join(lines)


def current_source(doc_text: str) -> str:
    m = re.search(re.escape(BEGIN) + r"(\S+)", doc_text)
    if not m:
        raise SystemExit("no AUTOGEN block found in docs/BENCHMARKS.md")
    return m.group(1)


def replace_block(doc_text: str, block: str) -> str:
    pattern = re.compile(
        re.escape(BEGIN) + r".*?" + re.escape(END), flags=re.DOTALL
    )
    if not pattern.search(doc_text):
        raise SystemExit("no AUTOGEN block found in docs/BENCHMARKS.md")
    return pattern.sub(lambda _: block, doc_text)


def main(argv):
    artifact = argv[1] if len(argv) > 1 else newest_artifact().name
    doc = DOC.read_text()
    DOC.write_text(replace_block(doc, render(artifact)))
    print(f"docs/BENCHMARKS.md headline block rendered from {artifact}")


if __name__ == "__main__":
    main(sys.argv)
