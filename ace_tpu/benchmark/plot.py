"""Benchmark result plot (reference: fme/core/benchmark/run.py:114 —
saves a PNG per benchmark run alongside the JSON).

One figure per run: horizontal mean-time bars across benchmarks, with
the best (min) repeat marked, labeled directly. Single-measure chart —
one hue, text in ink (not series color), recessive axes.
"""

import logging

logger = logging.getLogger(__name__)

_BAR = "#5778a4"  # single-series muted blue
_INK = "#333333"
_MUTED = "#767676"


def _fmt_ms(ms: float) -> str:
    if ms >= 1000.0:
        return f"{ms / 1000.0:.2f}s"
    if ms >= 10.0:
        return f"{ms:.1f}ms"
    return f"{ms:.3g}ms"


def save_plot(results: list[dict], path: str, label: str = "") -> None:
    """Render mean/min per-iteration times for a benchmark run to PNG.

    ``results`` is a list of BenchmarkResult.to_dict() dicts.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    results = [r for r in results if r.get("mean_ms") is not None]
    if not results:
        logger.warning("no benchmark results to plot")
        return
    names = [r["name"] for r in results]
    means = [r["mean_ms"] for r in results]
    mins = [r["min_ms"] for r in results]

    fig, ax = plt.subplots(
        figsize=(8, 0.5 * len(results) + 1.6), constrained_layout=True
    )
    y = range(len(results))
    ax.barh(y, means, height=0.55, color=_BAR, zorder=2)
    # best repeat as a tick on each bar (secondary encoding, not color)
    ax.scatter(mins, y, marker="|", s=180, color=_INK, zorder=3,
               label="best repeat")
    for i, r in enumerate(results):
        note = _fmt_ms(r["mean_ms"])
        if r.get("regression_ok") is False:
            note += "  (regression FAILED)"
        ax.text(means[i], i, "  " + note, va="center", ha="left",
                fontsize=9, color=_INK, zorder=4)
    ax.set_yticks(list(y))
    ax.set_yticklabels(names, fontsize=9, color=_INK)
    ax.invert_yaxis()
    ax.set_xlabel("time per iteration (ms)", fontsize=9, color=_MUTED)
    ax.set_xlim(0, max(means) * 1.3)
    ax.spines[["top", "right", "left"]].set_visible(False)
    ax.tick_params(colors=_MUTED, labelsize=8)
    ax.grid(axis="x", color="#dddddd", linewidth=0.6, zorder=0)
    title = "kernel benchmarks"
    if label:
        title += f" — {label}"
    ax.set_title(title, fontsize=10, color=_INK, loc="left")
    ax.legend(loc="lower right", frameon=False, fontsize=8)
    fig.savefig(path, dpi=200)
    plt.close(fig)
    logger.info("saved benchmark plot to %s", path)
