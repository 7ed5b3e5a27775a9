"""Render results/curves.png — the framework's equivalent of the reference's
results.png (Fig. 5: time-per-1000-queries vs recall@10 per dataset).

Reads only committed results/*.json (no TPU needed). One panel per corpus,
one series per engine: forest (reference candidate-set semantics), flat
quantized scan, IVF clustered-flat. X is seconds per 1000 queries (log),
Y is recall@10 vs exact ground truth.

Run: python scripts/plot_results.py
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, ".")

# dataviz reference palette, light mode, slots 1-3 (validated all-pairs)
C_FOREST = "#2a78d6"
C_FLAT = "#eb6834"
C_IVF = "#1baf7a"
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"


def load(path):
    with open(path) as f:
        return json.load(f)


def forest_points(doc):
    """(s_per_1000, recall) for forest operating points, pareto-sorted."""
    pts = []
    for p in doc.get("points", []):
        rec = p.get("recall@10", p.get("recall"))
        qps = p.get("qps")
        if rec is None or not qps:
            continue
        pts.append((1000.0 / qps, rec))
    return sorted(pts)


def pareto(pts):
    """Keep points not dominated (faster AND at least as accurate)."""
    best, out = -1.0, []
    for t, r in sorted(pts):
        if r > best:
            out.append((t, r))
            best = r
    return out


def panel(ax, title, series):
    for name, color, pts in series:
        if not pts:
            continue
        ax.plot([p[0] for p in pts], [p[1] for p in pts], "o", color=color,
                markersize=4, alpha=0.35, markeredgewidth=0)
        front = pareto(pts)
        ts = [p[0] for p in front]
        rs = [p[1] for p in front]
        ax.plot(ts, rs, "-o", color=color, linewidth=2, markersize=5,
                label=name, markeredgecolor=SURFACE, markeredgewidth=1)
    ax.set_xscale("log")
    from matplotlib.ticker import FuncFormatter, LogLocator, NullFormatter

    ax.xaxis.set_major_locator(LogLocator(base=10, subs=(1.0, 2.0, 5.0)))
    ax.xaxis.set_major_formatter(FuncFormatter(lambda v, _: f"{v:g}"))
    ax.xaxis.set_minor_formatter(NullFormatter())
    ax.set_title(title, color=INK, fontsize=11)
    ax.set_xlabel("seconds per 1000 queries (log)", color=INK2, fontsize=9)
    ax.grid(True, which="both", color="#e6e4df", linewidth=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c9c7c0")
    ax.tick_params(colors=INK2, labelsize=8)


def flat_rows_points(row):
    """Operating points from a bench_hard8m-style flat row (mode_rfX keys)."""
    pts = []
    for key, qps in row.items():
        if key.endswith("_qps"):
            tag = key[: -len("_qps")]
            rec = row.get(f"{tag}_recall@10")
            if rec is not None and qps:
                pts.append((1000.0 / qps, rec))
    return sorted(pts)


def main():
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    panels = []

    # --- GloVe-1.2M panel ---
    glove_forest = []
    for fn in ("results/glove1p2m.json", "results/recall_time_1p2m.json"):
        if os.path.exists(fn):
            glove_forest += forest_points(load(fn))
    glove_flat = []
    for p in load("results/flat.json")["points"]:
        if p["corpus"].startswith("glove"):
            glove_flat.append((1000.0 / p["qps"], p["recall@10"]))
    panels.append(("GloVe-shaped 1.2M x 100d",
                   [("forest", C_FOREST, glove_forest),
                    ("flat", C_FLAT, glove_flat)]))

    # --- SIFT-1M panel ---
    sift_forest = forest_points(load("results/sift1m.json"))
    panels.append(("SIFT-shaped 1M x 128d",
                   [("forest", C_FOREST, sift_forest)]))

    # --- Deep-8M panel ---
    deep_forest = forest_points(load("results/deep8m.json"))
    if os.path.exists("results/deep8m_coarse.json"):
        deep_forest += forest_points(load("results/deep8m_coarse.json"))
    if os.path.exists("results/deep8m_coarse_fold.json"):
        # folded tier + staged rerank frontier (r4/r5)
        deep_forest += forest_points(
            load("results/deep8m_coarse_fold.json"))
    deep_flat = []
    for p in load("results/flat.json")["points"]:
        if p["corpus"].startswith("deep"):
            deep_flat.append((1000.0 / p["qps"], p["recall@10"]))
    deep_ivf = []
    if os.path.exists("results/ivf_deep8m.json"):
        for p in load("results/ivf_deep8m.json")["points"]:
            deep_ivf.append((1000.0 / p["qps"], p["recall@10"]))
    panels.append(("Deep-shaped 8M x 96d (per-chip slice)",
                   [("forest", C_FOREST, deep_forest),
                    ("flat", C_FLAT, deep_flat),
                    ("IVF", C_IVF, deep_ivf)]))

    # --- HARD 8M panel (binding recall: overlapping clusters + heavy
    # tail, recall governed by coverage knobs — VERDICT r2 item 1) ---
    if os.path.exists("results/ivf_hard8m.json"):
        hard_ivf = [(1000.0 / p["qps"], p["recall@10"])
                    for p in load("results/ivf_hard8m.json")["points"]]
        hard_forest = []
        if os.path.exists("results/hard8m_coarse.json"):
            hard_forest = forest_points(load("results/hard8m_coarse.json"))
        hard_flat = []
        if os.path.exists("results/flat_hard8m.json"):
            for row in load("results/flat_hard8m.json")["points"]:
                hard_flat += flat_rows_points(row)
        panels.append(("HARD 8M x 96d (recall knobs bind)",
                       [("forest", C_FOREST, hard_forest),
                        ("flat", C_FLAT, hard_flat),
                        ("IVF", C_IVF, hard_ivf)]))

    # --- HARD 30M single-chip capacity panel (Deep-100M residency model
    # executed at 30M rows: int8 sketch + bf16 refine resident) ---
    if os.path.exists("results/deep30m.json"):
        panels.append(("HARD 30M x 96d (one chip, bf16-resident)",
                       [("IVF", C_IVF, forest_points(load("results/deep30m.json")))]))

    # --- High-dim panel (D=784, hard mixture) ---
    if os.path.exists("results/d784.json"):
        d784 = load("results/d784.json")["points"]
        by_engine = {}
        for p in d784:
            rec, qps = p.get("recall@10"), p.get("qps")
            if rec and qps:
                by_engine.setdefault(p["engine"], []).append((1000.0 / qps, rec))
        series = [(name, color, sorted(by_engine.get(name, [])))
                  for name, color in (("forest", C_FOREST), ("flat", C_FLAT),
                                      ("ivf", C_IVF))]
        panels.append(("HARD 200k x 784d (MNIST-shaped)", series))

    ncols = 3 if len(panels) > 4 else len(panels)
    nrows = (len(panels) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3.8 * nrows),
                             facecolor=SURFACE, squeeze=False)
    flat_axes = [ax for row in axes for ax in row]
    for ax, (title, series) in zip(flat_axes, panels):
        panel(ax, title, series)
    for ax in flat_axes[len(panels):]:
        ax.set_visible(False)

    for row in axes:
        row[0].set_ylabel("recall@10 (exact GT)", color=INK2, fontsize=9)
    for ax in flat_axes[: len(panels)]:
        ax.set_facecolor(SURFACE)
        ax.legend(loc="lower right", fontsize=8, frameon=False,
                  labelcolor=INK)
    fig.suptitle(
        "TPU v5e, one chip — operating-point curves (synthetic clustered "
        "corpora, exact ground truth; cf. reference results.png Fig. 5)",
        color=INK, fontsize=10, y=1.02)
    fig.tight_layout()
    fig.savefig("results/curves.png", dpi=140, bbox_inches="tight",
                facecolor=SURFACE)
    print("WROTE results/curves.png")


if __name__ == "__main__":
    main()
