"""In-training sampling evaluation: metrics, sample dumps, chain GIFs.

Equivalents of the reference LightningModule eval loops
(/root/reference/lightning_modules.py:382-712): periodic
``sample_and_analyze[_given_pocket]`` quality metrics, xyz dumps of samples,
and denoising-chain visualization, dispatched on the model family exactly
like the reference's ``suffix = '' if joint else '_given_pocket'``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from diffsbdd_tpu.chem.visualization import (save_xyz_file,
                                             visualize, visualize_chain)
from diffsbdd_tpu.data.dataset import pad_batch, round_to_bucket
from diffsbdd_tpu.diffusion.ddpm import JointDDPM, num_nodes_to_mask


def residues_to_atoms(x_ca: np.ndarray, atom_encoder) -> np.ndarray:
    """CA positions -> carbon one-hot for visualization (utils.py:88-94)."""
    one_hot = np.zeros(x_ca.shape[:-1] + (len(atom_encoder),), np.float32)
    one_hot[..., atom_encoder["C"]] = 1.0
    return one_hot


class SamplingEvaluator:
    def __init__(self, module, dataset=None, dataset_smiles=None,
                 outdir="eval_out", wandb=None, datadir=None,
                 perception=None):
        self.module = module
        # bond-perception route for metric molecules: None keeps
        # build_molecule's default (OpenBabel if installed, else EDM
        # tables); 'covalent' selects the in-repo OpenBabel-equivalent
        # (chem/molecule.py::perceive_bonds_covalent) — the reference's
        # default route, needed because the final decode's sigma_0 noise
        # breaks the 0.03 A EDM margins (SYNTH_DIAG_r05.json)
        self.perception = perception
        self.dataset = dataset  # validation LigandPocketDataset
        self.dataset_smiles = dataset_smiles
        self.outdir = Path(outdir)
        self.joint = isinstance(module.ddpm, JointDDPM)
        # the wandb MODULE (not a run): rendered molecule images and chain
        # GIFs are logged like the reference (visualization.py:336-369)
        self.wandb = wandb
        # processed-data directory holding val/<RECEPTOR>.pdb files; when
        # set, conditional eval passes resolved receptor paths so
        # analyze_samples can compute smina_score (lightning_modules.py:549)
        self.datadir = datadir

    def _receptor_path(self, receptor_name: str):
        """lightning_modules.py get_full_path: '1abc.bio1' ->
        datadir/val/1ABC-bio1.pdb."""
        pdb, _, suffix = str(receptor_name).partition(".")
        return Path(self.datadir, "val", f"{pdb.upper()}-{suffix}.pdb")

    # ------------------------------------------------------------- dispatch
    def sample_and_analyze(self, params, rng, n_samples, batch_size=None,
                           size_rng=None) -> Dict[str, float]:
        if self.joint:
            return self._analyze_joint(params, rng, n_samples,
                                       batch_size or n_samples, size_rng)
        return self._analyze_given_pocket(params, rng, n_samples,
                                          batch_size or n_samples, size_rng)

    # ----------------------------------------------------------- joint mode
    def _analyze_joint(self, params, rng, n_samples, batch_size, size_rng):
        """lightning_modules.py:412-447 on padded batches."""
        mod = self.module
        molecules, atom_types, aa_types = [], [], []
        size_rng = size_rng or np.random.default_rng(0)
        # bounded batch loop like the reference (lightning_modules.py:506):
        # analyzing slightly fewer molecules beats hanging the training run
        # if a batch yields no usable molecules
        for _ in range(-(-n_samples // batch_size)):
            if len(molecules) >= n_samples:
                break
            n = min(batch_size, n_samples - len(molecules))
            n_lig, n_pkt = mod.ddpm.size_distribution.sample(n, rng=size_rng)
            nl_pad = round_to_bucket(int(n_lig.max()), mod.lig_bucket)
            np_pad = round_to_bucket(int(n_pkt.max()), mod.pocket_bucket)
            lig_mask = jnp.asarray(num_nodes_to_mask(n_lig, nl_pad))
            pkt_mask = jnp.asarray(num_nodes_to_mask(n_pkt, np_pad))
            rng, step = jax.random.split(rng)
            # segmented dispatch: identical trajectory, but no single device
            # execution spans the full T steps (execution-watchdog safety)
            xh_lig, xh_pkt = mod.ddpm.sample_segmented(
                params, step, (lig_mask, pkt_mask), segment=50)
            molecules.extend(self._to_molecules(xh_lig, lig_mask))
            atom_types.extend(
                np.asarray(xh_lig[..., 3:].argmax(-1))[
                    np.asarray(lig_mask) > 0].tolist())
            aa_types.extend(
                np.asarray(xh_pkt[..., 3:].argmax(-1))[
                    np.asarray(pkt_mask) > 0].tolist())
        return mod.analyze_samples(molecules[:n_samples], atom_types,
                                   aa_types, dataset_smiles=self.dataset_smiles)

    # ----------------------------------------------------- conditional mode
    def _val_pocket_batch(self, idx: List[int]):
        items = [self.dataset[i % len(self.dataset)] for i in idx]
        nl_pad = round_to_bucket(
            max(len(it["lig_coords"]) for it in items), self.module.lig_bucket)
        np_pad = round_to_bucket(
            max(len(it["pocket_coords"]) for it in items),
            self.module.pocket_bucket)
        batch = pad_batch(items, nl_pad, np_pad)
        ligand = {k: jnp.asarray(v) for k, v in batch["ligand"].items()}
        pocket = {k: jnp.asarray(v) for k, v in batch["pocket"].items()}
        return ligand, pocket, batch["receptors"]

    def _analyze_given_pocket(self, params, rng, n_samples, batch_size,
                              size_rng):
        """lightning_modules.py:492-549 on padded batches."""
        mod = self.module
        size_rng = size_rng or np.random.default_rng(0)
        molecules, atom_types, aa_types, receptors = [], [], [], []
        # bounded loop (lightning_modules.py:506) — see _analyze_joint
        for i in range(-(-n_samples // batch_size)):
            if len(molecules) >= n_samples:
                break
            n = min(batch_size, n_samples - len(molecules))
            _, pocket, recs = self._val_pocket_batch(
                list(range(i * batch_size, i * batch_size + n)))
            if mod.virtual_nodes:
                num_nodes = np.full(n, mod.max_num_nodes)
            else:
                num_nodes = mod.ddpm.size_distribution.sample_conditional(
                    n2=np.asarray(pocket["size"]), rng=size_rng)
                num_nodes = np.clip(num_nodes, 1, None)
            nl_pad = round_to_bucket(int(num_nodes.max()), mod.lig_bucket)
            lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, nl_pad))
            rng, step = jax.random.split(rng)
            # segmented dispatch — see _analyze_joint
            xh_lig, xh_pkt = mod.ddpm.sample_given_pocket_segmented(
                params, step, pocket, lig_mask, segment=50)
            mols, kept = self._to_molecules(xh_lig, lig_mask,
                                            strip_virtual=mod.virtual_nodes,
                                            return_kept=True)
            molecules.extend(mols)
            # receptor list stays 1:1 with the molecules actually kept
            receptors.extend(recs[k] for k in kept)
            for m in mols:
                atom_types.extend(mod.lig_type_encoder[s] for s in m.symbols)
            aa_types.extend(
                np.asarray(xh_pkt[..., 3:].argmax(-1))[
                    np.asarray(pocket["mask"]) > 0].tolist())
        recs = [self._receptor_path(r) for r in receptors[:n_samples]] \
            if self.datadir is not None else None
        return mod.analyze_samples(molecules[:n_samples], atom_types,
                                   aa_types, receptors=recs,
                                   dataset_smiles=self.dataset_smiles)

    # ------------------------------------------------------------- helpers
    def _to_molecules(self, xh_lig, lig_mask, strip_virtual=False,
                      return_kept=False):
        from diffsbdd_tpu.chem.molecule import build_molecule
        mod = self.module
        xh = np.asarray(xh_lig)
        m = np.asarray(lig_mask)
        out, kept = [], []
        for b in range(xh.shape[0]):
            sel = m[b] > 0
            coords = xh[b, sel, :3]
            types = xh[b, sel, 3:].argmax(-1)
            if strip_virtual and mod.virtual_atom is not None:
                keep = types != mod.virtual_atom
                coords, types = coords[keep], types[keep]
            if len(types) == 0:
                continue
            out.append(build_molecule(coords, types, mod.dataset_info,
                                      add_coords=True,
                                      perception=self.perception))
            kept.append(b)
        return (out, kept) if return_kept else out

    # --------------------------------------------------------- sample dumps
    def sample_and_save(self, params, rng, n_samples, epoch=0, size_rng=None):
        """Render n samples as xyz + png (lightning_modules.py:551-607)."""
        mod = self.module
        size_rng = size_rng or np.random.default_rng(0)
        if self.joint:
            n_lig, n_pkt = mod.ddpm.size_distribution.sample(
                n_samples, rng=size_rng)
            nl_pad = round_to_bucket(int(n_lig.max()), mod.lig_bucket)
            np_pad = round_to_bucket(int(n_pkt.max()), mod.pocket_bucket)
            lig_mask = jnp.asarray(num_nodes_to_mask(n_lig, nl_pad))
            pkt_mask = jnp.asarray(num_nodes_to_mask(n_pkt, np_pad))
            xh_lig, xh_pkt = mod.ddpm.sample_segmented(
                params, rng, (lig_mask, pkt_mask), segment=50)
            pocket_mask = pkt_mask
        else:
            _, pocket, _ = self._val_pocket_batch(list(range(n_samples)))
            if mod.virtual_nodes:
                # virtual-node models always generate at the fixed padded
                # size (lightning_modules.py:583-587)
                num_nodes = np.full(n_samples, mod.max_num_nodes)
            else:
                num_nodes = mod.ddpm.size_distribution.sample_conditional(
                    n2=np.asarray(pocket["size"]), rng=size_rng)
                num_nodes = np.clip(num_nodes, 1, None)
            nl_pad = round_to_bucket(int(num_nodes.max()), mod.lig_bucket)
            lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, nl_pad))
            xh_lig, xh_pkt = mod.ddpm.sample_given_pocket_segmented(
                params, rng, pocket, lig_mask, segment=50)
            pocket_mask = pocket["mask"]

        outdir = Path(self.outdir, f"epoch_{epoch}")
        self._write_complex_xyz(outdir, xh_lig, lig_mask, xh_pkt, pocket_mask)
        visualize(str(outdir), dataset_info=mod.dataset_info,
                  wandb=self.wandb)
        return outdir

    def sample_chain_and_save(self, params, rng, keep_frames, epoch=0,
                              size_rng=None):
        """Denoising-trajectory GIF (lightning_modules.py:609-712)."""
        mod = self.module
        size_rng = size_rng or np.random.default_rng(0)
        T = mod.ddpm.T
        keep_frames = min(keep_frames, T)
        while T % keep_frames != 0:
            keep_frames -= 1
        if self.joint:
            n_lig, n_pkt = mod.ddpm.size_distribution.sample(1, rng=size_rng)
            nl_pad = round_to_bucket(int(n_lig.max()), mod.lig_bucket)
            np_pad = round_to_bucket(int(n_pkt.max()), mod.pocket_bucket)
            lig_mask = jnp.asarray(num_nodes_to_mask(n_lig, nl_pad))
            pkt_mask = jnp.asarray(num_nodes_to_mask(n_pkt, np_pad))
            frames_lig, frames_pkt = mod.ddpm.sample_chain(
                params, rng, (lig_mask, pkt_mask), return_frames=keep_frames)
            pocket_mask = pkt_mask
        else:
            _, pocket, _ = self._val_pocket_batch([0])
            if mod.virtual_nodes:
                # fixed padded size for virtual-node models
                # (lightning_modules.py:666-670)
                num_nodes = np.full(1, mod.max_num_nodes)
            else:
                num_nodes = mod.ddpm.size_distribution.sample_conditional(
                    n2=np.asarray(pocket["size"]), rng=size_rng)
                num_nodes = np.clip(num_nodes, 1, None)
            nl_pad = round_to_bucket(int(num_nodes.max()), mod.lig_bucket)
            lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes, nl_pad))
            frames_lig, frames_pkt = mod.ddpm.sample_given_pocket_chain(
                params, rng, pocket, lig_mask, return_frames=keep_frames)
            pocket_mask = pocket["mask"]

        outdir = Path(self.outdir, f"epoch_{epoch}", "chain")
        outdir.mkdir(parents=True, exist_ok=True)
        n_frames = frames_lig.shape[0]
        for f in range(n_frames):
            self._write_complex_xyz(outdir, frames_lig[f], lig_mask,
                                    frames_pkt[f], pocket_mask,
                                    name=f"chain_{f:04d}")
        gif = visualize_chain(str(outdir), self.module.dataset_info,
                              wandb=self.wandb)
        return gif

    def _write_complex_xyz(self, outdir, xh_lig, lig_mask, xh_pkt, pkt_mask,
                           name="molecule"):
        mod = self.module
        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        xh_lig = np.asarray(xh_lig)
        xh_pkt = np.asarray(xh_pkt)
        m_l = np.asarray(lig_mask)
        m_p = np.asarray(pkt_mask)
        A = len(mod.lig_type_decoder)
        for b in range(xh_lig.shape[0]):
            sel_l = m_l[b] > 0
            sel_p = m_p[b] > 0
            x_l = xh_lig[b, sel_l, :3]
            oh_l = np.eye(A)[xh_lig[b, sel_l, 3:].argmax(-1)]
            x_p = xh_pkt[b, sel_p, :3]
            if mod.pocket_representation == "CA":
                oh_p = residues_to_atoms(x_p, mod.lig_type_encoder)
            else:
                idx = xh_pkt[b, sel_p, 3:].argmax(-1)
                oh_p = np.eye(A)[np.minimum(idx, A - 1)]
            x = np.concatenate([x_l, x_p])
            oh = np.concatenate([oh_l, oh_p])
            save_xyz_file(outdir, oh, x, mod.lig_type_decoder,
                          name=f"{name}_{b:03d}" if name == "molecule"
                          else name)
