"""Latent-trajectory visualization (matplotlib; analysis-layer utility).

Equivalent of the reference's `alignment/alignment_visualization.py:11-243`
grid plots of 1-D/2-D/3-D aligned latent trajectories, used by the figure
notebooks to eyeball alignment quality. Import is lazy so the compute
library never requires matplotlib.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_latent_trajectories_1d(latents, labels=None, dims=4, save_path=None):
    """Per-dim time courses of condition-averaged latents, views overlaid.

    Args:
        latents: list of (n_classes, T, K) aligned condition averages.
        labels: optional legend names per view.
        dims: number of latent dims to plot.
    """
    plt = _plt()
    n_cls = latents[0].shape[0]
    fig, axes = plt.subplots(
        dims, n_cls, figsize=(2.0 * n_cls, 1.6 * dims), squeeze=False
    )
    for d in range(dims):
        for c in range(n_cls):
            ax = axes[d][c]
            for v, L in enumerate(latents):
                name = labels[v] if labels else f"view {v}"
                ax.plot(np.asarray(L[c, :, d]), lw=1, label=name)
            if d == 0:
                ax.set_title(f"class {c}", fontsize=8)
            if c == 0:
                ax.set_ylabel(f"dim {d}", fontsize=8)
            ax.tick_params(labelsize=6)
    axes[0][0].legend(fontsize=6)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig


def plot_latent_trajectories_2d(latents, dims=(0, 1), labels=None,
                                save_path=None):
    """2-D phase plots of the top two aligned dims per class."""
    plt = _plt()
    n_cls = latents[0].shape[0]
    fig, axes = plt.subplots(1, n_cls, figsize=(2.2 * n_cls, 2.2),
                             squeeze=False)
    i, j = dims
    for c in range(n_cls):
        ax = axes[0][c]
        for v, L in enumerate(latents):
            name = labels[v] if labels else f"view {v}"
            ax.plot(np.asarray(L[c, :, i]), np.asarray(L[c, :, j]), lw=1,
                    label=name)
        ax.set_title(f"class {c}", fontsize=8)
        ax.tick_params(labelsize=6)
    axes[0][0].legend(fontsize=6)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig


def plot_latent_trajectories_3d(latents, dims=(0, 1, 2), labels=None,
                                save_path=None):
    """3-D trajectories of the top three aligned dims, classes as colors."""
    plt = _plt()
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    i, j, k = dims
    for v, L in enumerate(latents):
        name = labels[v] if labels else f"view {v}"
        for c in range(L.shape[0]):
            ax.plot(
                np.asarray(L[c, :, i]),
                np.asarray(L[c, :, j]),
                np.asarray(L[c, :, k]),
                lw=1,
                alpha=0.8,
                label=name if c == 0 else None,
            )
    ax.legend(fontsize=7)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig


def plot_rdm(rdm, labels=None, title=None, cmap="viridis", save_path=None):
    """Representational-dissimilarity-matrix heatmap (fig_6 ``plot_rdm``,
    `figure_analyses/fig_6.ipynb` cell 15)."""
    plt = _plt()
    rdm = np.asarray(rdm)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(rdm, cmap=cmap)
    fig.colorbar(im, ax=ax)
    if labels is not None:
        ticks = np.arange(len(labels))
        ax.set_xticks(ticks, labels, rotation=90)
        ax.set_yticks(ticks, labels)
    if title:
        ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    return fig
