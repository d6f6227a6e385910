#!/usr/bin/env python
"""Render docs/graphs/*.png from the RECORDED measurements in
docs/BENCHMARKS.md (the reference's `make graphs` role,
test/make_graph.py + Makefile:70-82, applied to this repo's numbers).
Re-run after refreshing the benchmark log; pure matplotlib, no TPU."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stereomatching_tpu.bench.graphs import _plt

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "graphs")

# Classic pipeline optimization progression, 1 MP x 64 d, ms/pair
# (docs/BENCHMARKS.md round-1 + round-2 tables).
CLASSIC = [
    ("XLA SAT\n(b8)", 25.39),
    ("XLA MXU box\n(b8)", 8.76),
    ("fused kernel\n(b8)", 5.87),
    ("+ int8 MXU box\n(b16)", 3.17),
    ("batch 128\n(round-1 final)", 1.93),
    ("chunked band", 1.72),
    ("single kernel", 1.66),
    ("round-2 final", 1.33),
    ("batch 256\ntile 224", 1.10),
]

# SGM progression, 1 MP x 64 d, ms/pair (docs/BENCHMARKS.md).
SGM = [
    ("XLA scan\n(round 1)", 96.9),
    ("VMEM kernel\nint32", 55.3),
    ("int16 storage\nbatch 8", 20.3),
    ("fused tail\n+ fill", 13.7),
    ("chunk-major\n+ fold (b16)", 9.42),
    ("batch 28\n(round-2 final)", 8.66),
    ("int8 storage\nbatch 32", 7.41),
    ("d-major build\n(round-4 final)", 7.37),
]

# Size sweep (tools/size_sweep_tpu.py) vs the reference CUDA-ghost
# (report/data.txt:4), seconds/pair.
SIZES = ["240x135", "480x270", "960x540", "1920x1080", "3840x2160",
         "7680x4320"]
TPU_S = [0.000265, 0.000669, 0.000914, 0.002483, 0.01031, 0.04050]  # round-5 8K diffusion fix
REF_S = [0.006076, 0.015374, 0.055790, 0.232813, 0.878147, 3.270732]


def bars(ax, labels, values, color):
    ax.bar(range(len(labels)), values, color=color)
    ax.set_xticks(range(len(labels)))
    ax.set_xticklabels(labels, fontsize=8)
    for i, v in enumerate(values):
        ax.annotate(f"{v:g}", (i, v), ha="center", va="bottom", fontsize=8)


def main() -> int:
    plt = _plt()
    if plt is None:
        return 1
    os.makedirs(OUT, exist_ok=True)

    for name, data, title in (
        ("speedup_progression", CLASSIC,
         "Classic pipeline, 1024x1024x64d — ms/pair per optimization"),
        ("sgm_progression", SGM,
         "SGM pipeline, 1024x1024x64d census — ms/pair per optimization"),
    ):
        labels = [l for l, _ in data]
        vals = [v for _, v in data]
        fig, ax = plt.subplots(figsize=(1.25 * len(data) + 2, 4))
        bars(ax, labels, vals, "#4878a8")
        ax.set_ylabel("ms / pair")
        ax.set_yscale("log")
        ax.set_title(title, fontsize=10)
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, f"{name}.png"), dpi=120)
        plt.close(fig)

    fig, ax = plt.subplots(figsize=(9, 4))
    w = 0.38
    xs = range(len(SIZES))
    ax.bar([x - w / 2 for x in xs], REF_S, w, label="reference CUDA-ghost",
           color="#b0b0b0")
    ax.bar([x + w / 2 for x in xs], TPU_S, w, label="this repo, 1 TPU v5e",
           color="#4878a8")
    ax.set_xticks(list(xs))
    ax.set_xticklabels(SIZES, fontsize=8)
    ax.set_ylabel("seconds / pair")
    ax.set_yscale("log")
    ax.set_title("Size sweep (reference at 30 shifts, TPU at 64)",
                 fontsize=10)
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "tiers.png"), dpi=120)
    plt.close(fig)
    print(f"rendered 3 charts into {os.path.normpath(OUT)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
