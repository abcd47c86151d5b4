"""Evaluation plot artifacts (confusion matrix, ROC, PR curves).

File names, figure sizes, dpi and styling match the reference outputs so the
artifact contract is preserved: ``confusion_matrix_<name>.png``,
``roc_curve_<name>.png``, ``pr_curve_<name>.png`` at dpi=300
(reference notebooks/extended_metrics.py:497-574).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from dfu_multimodal_tpu.eval import metrics as M


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_confusion_matrix(y_true, y_pred, model_name: str,
                          output_dir: Path) -> Path:
    plt = _plt()
    cm = M.binary_confusion(y_true, y_pred)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(cm, cmap="Blues", interpolation="nearest")
    plt.colorbar(im)
    ax.set_xticks([0, 1]); ax.set_yticks([0, 1])
    ax.set_xticklabels(["Healthy", "Ulcer"])
    ax.set_yticklabels(["Healthy", "Ulcer"])
    for i in range(2):
        for j in range(2):
            ax.text(j, i, cm[i, j], ha="center", va="center",
                    color="white" if cm[i, j] > cm.max() / 2 else "black",
                    fontsize=14, fontweight="bold")
    ax.set_ylabel("True Label")
    ax.set_xlabel("Predicted Label")
    ax.set_title(f"Confusion Matrix: {model_name}")
    plt.tight_layout()
    out = Path(output_dir) / f"confusion_matrix_{model_name}.png"
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_roc_curve(y_true, y_probs, model_name: str, output_dir: Path,
                   band=None, band_alpha: float = 0.05) -> Path:
    """``band`` (optional): ``(fpr_grid, tpr_lo, tpr_mean, tpr_hi)`` from
    ``eval.bootstrap.roc_band`` — drawn as a shaded bootstrap CI behind
    the curve when ``extended_metrics --bootstrap`` is on; the default
    artifact is unchanged without it."""
    plt = _plt()
    fpr, tpr, _ = M.roc_curve(y_true, y_probs)
    roc_auc = M.trapezoid_auc(fpr, tpr)
    fig, ax = plt.subplots(figsize=(8, 6))
    if band is not None:
        fgrid, lo, _, hi = band
        pct = round(100 * (1.0 - band_alpha))
        ax.fill_between(fgrid, lo, hi, color="darkorange", alpha=0.18,
                        linewidth=0, label=f"Bootstrap {pct}% band")
    ax.plot(fpr, tpr, color="darkorange", lw=2,
            label=f"ROC (AUC={roc_auc:.4f})")
    ax.plot([0, 1], [0, 1], color="navy", lw=2, linestyle="--",
            label="Random")
    ax.set_xlim([0.0, 1.0]); ax.set_ylim([0.0, 1.05])
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title(f"ROC Curve: {model_name}")
    ax.legend(loc="lower right")
    ax.grid(alpha=0.3)
    plt.tight_layout()
    out = Path(output_dir) / f"roc_curve_{model_name}.png"
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_precision_recall_curve(y_true, y_probs, model_name: str,
                                output_dir: Path) -> Path:
    plt = _plt()
    precision, recall, _ = M.precision_recall_curve(y_true, y_probs)
    pr_auc = M.trapezoid_auc(recall, precision)
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.plot(recall, precision, color="green", lw=2,
            label=f"PR (AUC={pr_auc:.4f})")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_title(f"Precision-Recall Curve: {model_name}")
    ax.legend(loc="lower left")
    ax.grid(alpha=0.3)
    ax.set_xlim([0.0, 1.0]); ax.set_ylim([0.0, 1.05])
    plt.tight_layout()
    out = Path(output_dir) / f"pr_curve_{model_name}.png"
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_reliability_diagram(y_true, y_probs, model_name: str,
                             output_dir: Path, n_bins: int = 15,
                             temperature: float | None = None) -> Path:
    """Reliability diagram (beyond-reference, ``extended_metrics
    --calibration``): per-bin mean confidence vs empirical ulcer rate
    against the perfect-calibration diagonal, with the bin histogram
    underneath. When ``temperature`` is given, the temperature-scaled
    curve is overlaid."""
    from dfu_multimodal_tpu.eval import calibration as C
    plt = _plt()
    fig, (ax, axh) = plt.subplots(
        2, 1, figsize=(8, 8), sharex=True,
        gridspec_kw={"height_ratios": [3, 1]})
    ax.plot([0, 1], [0, 1], "k--", linewidth=1, label="Perfect calibration")

    def draw(probs, label, marker):
        mean_p, frac, counts = C.reliability_curve(y_true, probs, n_bins)
        ok = counts > 0
        err = C.calibration_errors(y_true, probs, n_bins)
        ax.plot(mean_p[ok], frac[ok], marker, linewidth=2,
                label=f"{label} (ECE {err['ece']:.3f}, "
                      f"Brier {err['brier']:.3f})")
        return counts

    counts = draw(y_probs, model_name, "o-")
    if temperature is not None:
        draw(C.apply_temperature(y_probs, temperature),
             f"T={temperature:.2f}", "s--")
    ax.set_ylabel("Empirical ulcer rate")
    ax.set_title(f"Reliability Diagram: {model_name}")
    ax.legend(loc="upper left")
    ax.set_xlim(0, 1); ax.set_ylim(0, 1)

    centers = (np.arange(n_bins) + 0.5) / n_bins
    axh.bar(centers, counts, width=1.0 / n_bins * 0.9, color="steelblue")
    axh.set_xlabel("Predicted P(Ulcer)")
    axh.set_ylabel("Count")
    plt.tight_layout()
    out = Path(output_dir) / f"reliability_diagram_{model_name}.png"
    plt.savefig(out, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return out
