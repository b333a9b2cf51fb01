"""Trajectory visualization (the SESyncVisualizer analog, matplotlib-based).

The reference ships an optional Pangolin/OpenGL iterate animation
(C++/SESync/include/SESync/SESyncVisualizer.h); here a headless matplotlib
renderer writes trajectory figures and convergence plots to files.
"""

from __future__ import annotations

import numpy as np


def plot_trajectory(t: np.ndarray, path: str, edges=None,
                    title: str = "trajectory", color_by_node=None):
    """Render a 2-D/3-D pose trajectory to `path` (png/pdf).

    t: [P, d] translations; edges: optional (i, j) arrays to draw loop
    closures; color_by_node: optional [P] node assignment for coloring.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = t.shape[1]
    fig = plt.figure(figsize=(8, 8))
    if d == 3:
        ax = fig.add_subplot(111, projection="3d")
    else:
        ax = fig.add_subplot(111)
        ax.set_aspect("equal")

    if color_by_node is not None:
        cmap = plt.get_cmap("tab10")
        for a in np.unique(color_by_node):
            sel = color_by_node == a
            pts = t[sel]
            ax.plot(*pts.T, ".", markersize=2, color=cmap(int(a) % 10),
                    label=f"node {a}")
        ax.legend(loc="best", fontsize=8)
    else:
        ax.plot(*t.T, "-", linewidth=0.5)

    if edges is not None:
        i, j = edges
        for k in range(len(i)):
            seg = np.stack([t[i[k]], t[j[k]]])
            ax.plot(*seg.T, "-", color="0.8", linewidth=0.3, zorder=-1)

    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def plot_convergence(history: np.ndarray, path: str, f_star: float = None,
                     title: str = "convergence"):
    """history rows: (iter, 2*fobj, 2*grad) (driver.run output)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    it = history[:, 0]
    if f_star is not None:
        ax1.semilogy(it, np.maximum(history[:, 1] - f_star, 1e-16))
        ax1.set_ylabel("2 fobj - 2 f*")
    else:
        ax1.plot(it, history[:, 1])
        ax1.set_ylabel("2 fobj")
    ax1.set_xlabel("iteration")
    ax2.semilogy(it, history[:, 2])
    ax2.set_xlabel("iteration")
    ax2.set_ylabel("2 |grad|")
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
