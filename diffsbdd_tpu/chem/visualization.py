"""Sample visualization: xyz dumps, matplotlib ball-and-stick renders, and
denoising-chain GIFs.

Functional equivalent of /root/reference/analysis/visualization.py (xyz IO
:19-63, 3D rendering :100-222, per-epoch rendering :323-341, chain GIFs
:343-369) with optional wandb logging hooks.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from diffsbdd_tpu.chem.molecule import get_bond_order_batch
from diffsbdd_tpu.chem.sdfio import (load_molecule_xyz, load_xyz_files,
                                     write_xyz_file)


def save_xyz_file(path, one_hot, positions, atom_decoder, name="molecule",
                  batch_mask=None):
    """Write one xyz file per graph in a flat batch (visualization.py:19-40)."""
    Path(path).mkdir(parents=True, exist_ok=True)
    one_hot = np.asarray(one_hot)
    positions = np.asarray(positions)
    if batch_mask is None:
        batch_mask = np.zeros(len(positions), dtype=int)
    batch_mask = np.asarray(batch_mask).astype(int)
    for batch_i in np.unique(batch_mask):
        sel = batch_mask == batch_i
        types = [atom_decoder[i] for i in one_hot[sel].argmax(-1)]
        write_xyz_file(positions[sel], types,
                       Path(path, f"{name}_{batch_i:03d}.txt"))


def save_padded_xyz(path, xh, mask, atom_decoder, n_dims=3, name="molecule"):
    """Padded-batch convenience: (B, N, 3+A) + (B, N) mask -> xyz files."""
    xh = np.asarray(xh)
    mask = np.asarray(mask)
    Path(path).mkdir(parents=True, exist_ok=True)
    for b in range(xh.shape[0]):
        sel = mask[b] > 0
        types = [atom_decoder[i] for i in xh[b, sel, n_dims:].argmax(-1)]
        write_xyz_file(xh[b, sel, :n_dims], types,
                       Path(path, f"{name}_{b:03d}.txt"))


def plot_molecule(ax, positions, atom_types, dataset_info, alpha=1.0,
                  spheres_3d=False, hex_bg_color="#FFFFFF"):
    """Ball-and-stick render onto a 3D matplotlib axis."""
    colors_dic = np.array(dataset_info["colors_dic"])
    radius_dic = np.array(dataset_info["radius_dic"])
    area_dic = 1500 * radius_dic**2

    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    areas = area_dic[atom_types]
    colors = colors_dic[atom_types]

    # one vectorized bond-order pass over all upper-triangle pairs (the
    # batch function exists for exactly this; calling it per pair made
    # chain-GIF rendering O(n^2) subprocess-scale slow)
    n = len(positions)
    ii, jj = np.triu_indices(n, k=1)
    if len(ii):
        dists = np.linalg.norm(positions[ii] - positions[jj], axis=1)
        orders = get_bond_order_batch(
            np.asarray(atom_types)[ii], np.asarray(atom_types)[jj],
            dists, dataset_info)
        for i, j, order in zip(ii, jj, orders):
            if order > 0:
                ax.plot([x[i], x[j]], [y[i], y[j]], [z[i], z[j]],
                        linewidth=(3 - 2) * 2 * 0.7 + int(order) * 0.7,
                        c=hex_bg_color == "#000000" and "#FFFFFF"
                        or "#666666",
                        alpha=alpha)
    ax.scatter(x, y, z, s=areas, alpha=0.9 * alpha, c=colors)


def plot_data3d(positions, atom_types, dataset_info, save_path=None,
                spheres_3d=False, bg="#FFFFFF", alpha=1.0, camera_elev=0,
                camera_azim=0):
    """Render one molecule to a file (visualization.py:152-222)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.set_aspect("auto")
    ax.view_init(elev=camera_elev, azim=camera_azim)
    ax.set_facecolor(bg)
    ax.xaxis.pane.set_alpha(0)
    ax.yaxis.pane.set_alpha(0)
    ax.zaxis.pane.set_alpha(0)
    ax.set_axis_off()

    plot_molecule(ax, positions, atom_types, dataset_info, alpha=alpha,
                  spheres_3d=spheres_3d, hex_bg_color=bg)

    max_value = np.abs(positions).max() if len(positions) else 1.0
    axis_lim = min(40, max(max_value / 1.5 + 0.3, 3.2))
    ax.set_xlim(-axis_lim, axis_lim)
    ax.set_ylim(-axis_lim, axis_lim)
    ax.set_zlim(-axis_lim, axis_lim)

    if save_path is None:
        plt.show()
    else:
        plt.savefig(save_path, bbox_inches="tight", pad_inches=0.0, dpi=120)
    plt.close(fig)


def visualize(path, dataset_info, max_num=25, wandb=None, spheres_3d=False):
    """Render every xyz file in a directory (visualization.py:323-341)."""
    files = load_xyz_files(path)[:max_num]
    for file in files:
        positions, one_hot = load_molecule_xyz(
            file, dataset_info["atom_encoder"])
        atom_types = one_hot.argmax(-1)
        out = str(file)[:-4] + ".png"
        plot_data3d(positions, atom_types, dataset_info, save_path=out,
                    spheres_3d=spheres_3d)
        if wandb is not None:
            wandb.log({"molecule": wandb.Image(out)})


def visualize_chain(path, dataset_info, wandb=None, spheres_3d=False,
                    mode="chain"):
    """Render a denoising trajectory as frames + GIF
    (visualization.py:343-369)."""
    files = load_xyz_files(path, shuffle=False)
    save_paths = []
    for file in files:
        positions, one_hot = load_molecule_xyz(
            file, dataset_info["atom_encoder"])
        atom_types = one_hot.argmax(-1)
        out = str(file)[:-4] + ".png"
        plot_data3d(positions, atom_types, dataset_info, save_path=out,
                    spheres_3d=spheres_3d)
        save_paths.append(out)

    if save_paths:
        import imageio
        gif_path = str(Path(path, f"output_{mode}.gif"))
        imgs = [imageio.v2.imread(fn) for fn in save_paths]
        imageio.mimsave(gif_path, imgs, subrectangles=True)
        if wandb is not None:
            wandb.log({mode: wandb.Video(gif_path, fps=4, format="gif")})
        return gif_path
    return None
