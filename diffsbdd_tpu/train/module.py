"""High-level model wrapper: config -> (dynamics + DDPM), loss assembly,
pocket preparation, and the top-level ``generate_ligands`` inference API.

Equivalent of the reference LightningModule ``LigandPocketDDPM``
(/root/reference/lightning_modules.py:31-899), re-shaped for the functional
JAX world: the module owns model *definitions* and host-side helpers; params
and optimizer state live with the training loop.
"""
from __future__ import annotations

import warnings
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffsbdd_tpu.chem import pdb as pdbmod
from diffsbdd_tpu.chem.molecule import SimpleMol, build_molecule, process_molecule
from diffsbdd_tpu.config import Config
from diffsbdd_tpu.constants import dataset_params
from diffsbdd_tpu.data.dataset import round_to_bucket
from diffsbdd_tpu.diffusion.ddpm import (ConditionalDDPM, JointDDPM,
                                         SimpleConditionalDDPM,
                                         num_nodes_to_mask)
from diffsbdd_tpu.diffusion.size_prior import SizeDistribution
from diffsbdd_tpu.models.dynamics import EGNNDynamics
from diffsbdd_tpu.train.augment import augment_batch
from diffsbdd_tpu.train.lj import WeightSchedule, lj_potential

DDPM_MODELS = {
    "joint": JointDDPM,
    "pocket_conditioning": ConditionalDDPM,
    "pocket_conditioning_simple": SimpleConditionalDDPM,
}


class LigandPocketDDPM:
    def __init__(
        self,
        dataset: str,
        mode: str,
        egnn_params: Config,
        diffusion_params: Config,
        node_histogram,
        pocket_representation: str = "CA",
        virtual_nodes: bool = False,
        auxiliary_loss: bool = False,
        loss_params: Optional[Config] = None,
        n_lig_max: int = 48,
        n_pocket_max: int = 512,
        lig_bucket: int = 8,
        pocket_bucket: int = 64,
        egnn_impl: str = "auto",
        kernel_tile_i: int = 16,
        kernel_sub_j: int = 16,
        kernel_skip_mode: str = "bits",
        kernel_bwd: str = "auto",
        kernel_bwd_sub_j: Optional[int] = None,
        kernel_bwd_precision: Optional[str] = None,
        kernel_block_fuse: bool = False,
        compute_dtype: str = "float32",
        matmul_precision: str = "float32",
        augment_noise: float = 0.0,
        augment_rotation: bool = False,
        nan_check: bool = False,
    ):
        assert mode in DDPM_MODELS
        assert pocket_representation in {"CA", "full-atom"}
        self.mode = mode
        self.pocket_representation = pocket_representation
        self.dataset_name = dataset
        self.dataset_info = dataset_params[dataset]
        self.T = diffusion_params.diffusion_steps
        self.loss_type = diffusion_params.diffusion_loss_type
        self.virtual_nodes = virtual_nodes
        self.augment_noise = float(augment_noise or 0.0)
        self.augment_rotation = bool(augment_rotation)
        self.n_lig_max = n_lig_max
        self.n_pocket_max = n_pocket_max
        self.lig_bucket = lig_bucket
        self.pocket_bucket = pocket_bucket

        self.lig_type_encoder = dict(self.dataset_info["atom_encoder"])
        self.lig_type_decoder = list(self.dataset_info["atom_decoder"])
        if pocket_representation == "CA":
            self.pocket_type_encoder = self.dataset_info["aa_encoder"]
            self.pocket_type_decoder = self.dataset_info["aa_decoder"]
        else:
            self.pocket_type_encoder = self.dataset_info["atom_encoder"]
            self.pocket_type_decoder = self.dataset_info["atom_decoder"]

        self.max_num_nodes = len(node_histogram) - 1
        self.virtual_atom = None
        if virtual_nodes:
            symbol = "Ne"  # visualized as neon, as in the reference
            self.lig_type_encoder[symbol] = len(self.lig_type_encoder)
            self.virtual_atom = self.lig_type_encoder[symbol]
            self.lig_type_decoder.append(symbol)
            self.dataset_info = dict(self.dataset_info)
            self.dataset_info["atom_encoder"] = self.lig_type_encoder
            self.dataset_info["atom_decoder"] = self.lig_type_decoder

        self.atom_nf = len(self.lig_type_decoder)
        self.residue_nf = len(self.pocket_type_decoder)
        self.x_dims = 3

        self.dynamics = EGNNDynamics(
            atom_nf=self.atom_nf,
            residue_nf=self.residue_nf,
            n_dims=self.x_dims,
            joint_nf=egnn_params.joint_nf,
            hidden_nf=egnn_params.hidden_nf,
            n_layers=egnn_params.n_layers,
            attention=egnn_params.attention,
            tanh=egnn_params.tanh,
            norm_constant=egnn_params.norm_constant,
            inv_sublayers=egnn_params.inv_sublayers,
            sin_embedding=egnn_params.sin_embedding,
            normalization_factor=egnn_params.normalization_factor,
            aggregation_method=egnn_params.aggregation_method,
            edge_cutoff_ligand=egnn_params.get("edge_cutoff_ligand"),
            edge_cutoff_pocket=egnn_params.get("edge_cutoff_pocket"),
            edge_cutoff_interaction=egnn_params.get("edge_cutoff_interaction"),
            update_pocket_coords=(mode == "joint"),
            reflection_equivariant=egnn_params.reflection_equivariant,
            edge_embedding_dim=egnn_params.get("edge_embedding_dim"),
            impl=egnn_impl,
            kernel_tile_i=kernel_tile_i,
            kernel_sub_j=kernel_sub_j,
            kernel_skip_mode=kernel_skip_mode,
            kernel_bwd=kernel_bwd,
            kernel_bwd_sub_j=kernel_bwd_sub_j,
            kernel_bwd_precision=kernel_bwd_precision,
            kernel_block_fuse=kernel_block_fuse,
            compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16"
            else jnp.float32,
            matmul_precision=matmul_precision,
            nan_check=nan_check,
        )

        self.ddpm = DDPM_MODELS[mode](
            dynamics=self.dynamics,
            atom_nf=self.atom_nf,
            residue_nf=self.residue_nf,
            n_dims=self.x_dims,
            timesteps=diffusion_params.diffusion_steps,
            noise_schedule=diffusion_params.diffusion_noise_schedule,
            noise_precision=diffusion_params.diffusion_noise_precision,
            loss_type=diffusion_params.diffusion_loss_type,
            norm_values=tuple(diffusion_params.normalize_factors),
            size_distribution=SizeDistribution(node_histogram),
            virtual_node_idx=self.virtual_atom,
        )

        self.auxiliary_loss = auxiliary_loss
        self.lj_rm = np.asarray(self.dataset_info["lennard_jones_rm"])
        if virtual_nodes and self.lj_rm.shape[0] < self.atom_nf:
            # virtual atoms never contribute LJ terms
            padded = np.zeros((self.atom_nf, self.atom_nf))
            padded[:self.lj_rm.shape[0], :self.lj_rm.shape[1]] = self.lj_rm
            self.lj_rm = padded
        if auxiliary_loss:
            self.clamp_lj = loss_params.clamp_lj
            self.auxiliary_weight_schedule = WeightSchedule(
                T=self.T, max_weight=loss_params.max_weight,
                mode=loss_params.schedule)

    # ------------------------------------------------------------------ setup
    def example_batch(self, batch_size: int = 2, n_lig: Optional[int] = None,
                      n_pocket: Optional[int] = None):
        """Zero-filled batch (defaults to the configured padded shapes)."""
        n_lig = n_lig or self.n_lig_max
        n_pocket = n_pocket or self.n_pocket_max
        lig = {
            "x": jnp.zeros((batch_size, n_lig, 3)),
            "one_hot": jnp.zeros((batch_size, n_lig, self.atom_nf)),
            "mask": jnp.ones((batch_size, n_lig)),
            "size": jnp.full((batch_size,), n_lig, jnp.int32),
        }
        pkt = {
            "x": jnp.zeros((batch_size, n_pocket, 3)),
            "one_hot": jnp.zeros((batch_size, n_pocket, self.residue_nf)),
            "mask": jnp.ones((batch_size, n_pocket)),
            "size": jnp.full((batch_size,), n_pocket, jnp.int32),
        }
        return lig, pkt

    def init_params(self, rng, batch_size: int = 1):
        # parameter shapes are independent of the node axes, so initialize on
        # tiny graphs — a full-shape init would pay a full forward compile
        lig, pkt = self.example_batch(batch_size, n_lig=4, n_pocket=4)
        return self.ddpm.init_params(rng, lig, pkt)

    # ------------------------------------------------------------------- loss
    def loss_fn(self, params, rng, ligand: Dict, pocket: Dict,
                training: bool = True):
        """Scalar loss + metrics dict; exactly the weighting of
        lightning_modules.py:236-302."""
        if training and (self.augment_noise > 0 or self.augment_rotation):
            # functional implementation of the reference's augmentation
            # options (lightning_modules.py:338-347, stubs there)
            rng, k_aug = jax.random.split(rng)
            ligand, pocket = augment_batch(
                k_aug, ligand, pocket, self.augment_noise,
                self.augment_rotation)
        terms = self.ddpm.loss_terms(params, rng, ligand, pocket, training)
        info = dict(terms.pop("info"))

        lig_size = ligand["size"].astype(jnp.float32)
        pkt_size = pocket["size"].astype(jnp.float32)
        if self.virtual_nodes:
            # missing key must be an error, not a silent fallback: using the
            # full (padded) ligand size would mis-normalize the x-term of the
            # l2 loss (reference raises KeyError, lightning_modules.py:247)
            actual_lig_size = lig_size - ligand["num_virtual_atoms"].astype(
                jnp.float32)
        else:
            actual_lig_size = lig_size

        error_t_lig = terms["error_t_lig"]
        error_t_pocket = terms["error_t_pocket"]
        if self.loss_type == "l2" and training:
            denom_lig = (self.x_dims * actual_lig_size
                         + self.ddpm.atom_nf * lig_size)
            error_t_lig = error_t_lig / denom_lig
            denom_pocket = (self.x_dims + self.ddpm.residue_nf) * pkt_size
            error_t_pocket = error_t_pocket / denom_pocket
            loss_t = 0.5 * (error_t_lig + error_t_pocket)
            loss_0 = (terms["loss_0_x_ligand"] / (self.x_dims * actual_lig_size)
                      + terms["loss_0_x_pocket"] / (self.x_dims * pkt_size)
                      + terms["loss_0_h"])
        else:
            loss_t = -self.T * 0.5 * terms["SNR_weight"] * (
                error_t_lig + error_t_pocket)
            loss_0 = (terms["loss_0_x_ligand"] + terms["loss_0_x_pocket"]
                      + terms["loss_0_h"] + terms["neg_log_constants"])

        nll = loss_t + loss_0 + terms["kl_prior"]

        if not (self.loss_type == "l2" and training):
            nll = nll - terms["delta_log_px"]
            if not self.virtual_nodes:
                nll = nll - terms["log_pN"]

        if self.auxiliary_loss and self.loss_type == "l2" and training:
            xh_hat = terms["xh_lig_hat"]
            weighted_lj = self.auxiliary_weight_schedule(
                terms["t_int"].astype(jnp.int32)) * lj_potential(
                xh_hat[..., :self.x_dims], xh_hat[..., self.x_dims:],
                ligand["mask"], self.lj_rm, self.ddpm.norm_values[0],
                clamp=self.clamp_lj)
            nll = nll + weighted_lj
            info["weighted_lj"] = weighted_lj.mean()

        info.update(
            error_t_lig=error_t_lig.mean(), error_t_pocket=error_t_pocket.mean(),
            SNR_weight=terms["SNR_weight"].mean(), loss_0=loss_0.mean(),
            kl_prior=terms["kl_prior"].mean(),
            delta_log_px=terms["delta_log_px"].mean(),
            neg_log_const_0=terms["neg_log_constants"].mean(),
            log_pN=terms["log_pN"].mean())
        loss = nll.mean()
        info["loss"] = loss
        return loss, info

    # ---------------------------------------------------------- pocket prep
    def prepare_pocket(self, residues: Sequence[pdbmod.Residue],
                       repeats: int = 1,
                       n_pocket_pad: Optional[int] = None) -> Dict:
        """BioPython-free port of lightning_modules.py:714-752 producing a
        padded pocket batch replicated ``repeats`` times."""
        if self.pocket_representation == "CA":
            coords, types = [], []
            for res in residues:
                ca = res.get_atom("CA")
                if ca is None:
                    # the reference indexes res['CA'] and raises
                    # (lightning_modules.py:718); silently dropping the
                    # residue would condition on a different binding site
                    # than the user specified
                    raise KeyError(
                        f"residue {res.chain_id}:{res.resseq} has no CA atom")
                coords.append(ca.coord)
                types.append(self.pocket_type_encoder[res.one_letter()])
            coords = np.asarray(coords, np.float32)
        else:
            coords, types = [], []
            for res in residues:
                for a in res.atoms:
                    el = a.element.capitalize()
                    if el == "H" and "H" not in self.pocket_type_encoder:
                        continue
                    if el not in self.pocket_type_encoder:
                        if "others" in self.pocket_type_encoder:
                            el = "others"
                        else:
                            raise KeyError(f"unknown pocket element {el}")
                    coords.append(a.coord)
                    types.append(self.pocket_type_encoder[el])
            coords = np.asarray(coords, np.float32)

        n = len(coords)
        n_pad = n_pocket_pad or round_to_bucket(n, self.pocket_bucket)
        one_hot = np.zeros((n, self.residue_nf), np.float32)
        one_hot[np.arange(n), types] = 1.0

        pocket = {
            "x": np.zeros((repeats, n_pad, 3), np.float32),
            "one_hot": np.zeros((repeats, n_pad, self.residue_nf), np.float32),
            "mask": np.zeros((repeats, n_pad), np.float32),
            "size": np.full((repeats,), n, np.int32),
        }
        pocket["x"][:, :n] = coords[None]
        pocket["one_hot"][:, :n] = one_hot[None]
        pocket["mask"][:, :n] = 1.0
        return {k: jnp.asarray(v) for k, v in pocket.items()}

    # ------------------------------------------------------------- inference
    def generate_ligands(
        self, params, rng, pdb_file, n_samples: int,
        pocket_ids: Optional[List[str]] = None,
        ref_ligand: Optional[str] = None,
        num_nodes_lig: Optional[np.ndarray] = None,
        sanitize: bool = False, largest_frag: bool = False,
        relax_iter: int = 0, timesteps: Optional[int] = None,
        n_nodes_bias: int = 0, n_nodes_min: int = 0,
        size_rng: Optional[np.random.Generator] = None,
        return_raw: bool = False, **kwargs,
    ) -> List[SimpleMol]:
        """Generate ligands for one pocket (lightning_modules.py:754-872).

        Joint checkpoints run as all-pocket-fixed inpainters; conditional
        checkpoints sample directly.
        """
        assert (pocket_ids is None) ^ (ref_ligand is None)
        struct = pdbmod.parse_pdb(pdb_file)
        if pocket_ids is not None:
            residues = [struct.residue(pid.split(":")[0], int(pid.split(":")[1]))
                        for pid in pocket_ids]
        else:
            residues = pdbmod.get_pocket_from_ligand(struct, ref_ligand)

        pocket = self.prepare_pocket(residues, repeats=n_samples)

        from diffsbdd_tpu.ops.masked import masked_mean
        pocket_com_before = np.asarray(masked_mean(pocket["x"],
                                                   pocket["mask"]))

        if num_nodes_lig is None:
            if self.virtual_nodes:
                # virtual-node models always generate at the padded max size
                # (lightning_modules.py:519-521)
                num_nodes_lig = np.full(n_samples, self.max_num_nodes)
            else:
                num_nodes_lig = self.ddpm.size_distribution.sample_conditional(
                    n2=np.asarray(pocket["size"]), rng=size_rng)
        num_nodes_lig = np.asarray(num_nodes_lig) + n_nodes_bias
        num_nodes_lig = np.clip(num_nodes_lig, n_nodes_min, None)

        n_lig_pad = round_to_bucket(int(num_nodes_lig.max()), self.lig_bucket)
        lig_mask = jnp.asarray(num_nodes_to_mask(num_nodes_lig, n_lig_pad))

        if isinstance(self.ddpm, JointDDPM):
            # inpaint with every pocket node fixed (lightning_modules.py:814-834)
            ligand = {
                "x": jnp.zeros((n_samples, n_lig_pad, 3)),
                "one_hot": jnp.zeros((n_samples, n_lig_pad, self.atom_nf)),
                "mask": lig_mask,
                "size": jnp.asarray(num_nodes_lig, jnp.int32),
            }
            xh_lig, xh_pocket = self.ddpm.inpaint_segmented(
                params, rng, ligand, pocket,
                lig_fixed=jnp.zeros_like(lig_mask),
                pocket_fixed=pocket["mask"],
                timesteps=timesteps, segment=50, **kwargs)
        else:
            # segmented dispatch keeps each device execution short while
            # producing the identical trajectory (tested bit-equal);
            # shared_pocket: prepare_pocket replicated ONE pocket across the
            # batch, so the batch-invariant first-layer factorization applies
            xh_lig, xh_pocket = self.ddpm.sample_given_pocket_segmented(
                params, rng, pocket, lig_mask, timesteps=timesteps,
                segment=50, shared_pocket=True)

        # translate back into the original pocket frame
        from diffsbdd_tpu.utils.misc import shift_to_pocket_frame
        pkt_m = np.asarray(pocket["mask"])
        lig_m = np.asarray(lig_mask)
        xh_lig, xh_pocket = shift_to_pocket_frame(
            xh_lig, xh_pocket, lig_m, pkt_m, pocket_com_before)

        molecules = []
        raw = []
        for b in range(n_samples):
            sel = lig_m[b] > 0
            coords = xh_lig[b, sel, :3]
            types = xh_lig[b, sel, 3:].argmax(-1)
            mol = build_molecule(coords, types, self.dataset_info,
                                 add_coords=True)
            raw.append(mol)
            mol = process_molecule(mol, add_hydrogens=False, sanitize=sanitize,
                                   relax_iter=relax_iter,
                                   largest_frag=largest_frag)
            if mol is not None:
                molecules.append(mol)
        if return_raw:
            return molecules, raw
        return molecules

    # ------------------------------------------------------------------ eval
    def analyze_samples(self, molecules: List[SimpleMol], atom_types,
                        aa_types, receptors=None,
                        dataset_smiles=None) -> Dict[str, float]:
        """Sampling-quality metric dict (lightning_modules.py:449-485)."""
        from diffsbdd_tpu.chem.docking import smina_score
        from diffsbdd_tpu.chem.metrics import (BasicMolecularMetrics,
                                               CategoricalDistribution,
                                               MoleculeProperties)

        lig_dist = CategoricalDistribution(
            self.dataset_info["atom_hist"], self.lig_type_encoder) \
            if not self.virtual_nodes else None
        kl_atom = lig_dist.kl_divergence(atom_types) if lig_dist else -1.0
        if self.pocket_representation == "CA":
            aa_dist = CategoricalDistribution(
                self.dataset_info["aa_hist"], self.pocket_type_encoder)
            kl_aa = aa_dist.kl_divergence(aa_types)
        else:
            kl_aa = -1.0

        metrics = BasicMolecularMetrics(self.dataset_info, dataset_smiles)
        (validity, connectivity, uniqueness, novelty), (_, connected) = \
            metrics.evaluate_mols(molecules)
        props = MoleculeProperties()
        qed, sa, logp, lipinski, diversity = props.evaluate_mean(connected)

        out = {
            "kl_div_atom_types": kl_atom,
            "kl_div_residue_types": kl_aa,
            "Validity": validity, "Connectivity": connectivity,
            "Uniqueness": uniqueness, "Novelty": novelty,
            "QED": qed, "SA": sa, "LogP": logp, "Lipinski": lipinski,
            "Diversity": diversity,
        }
        if receptors is not None and molecules \
                and len(receptors) == len(molecules) \
                and all(Path(r).exists() for r in receptors):
            # scored 1:1 on the molecule<->receptor pairing (the reference
            # scores the connected-fragment subset against the FULL receptor
            # list, silently mispairing as soon as one molecule drops out —
            # a misalignment, not a semantic, we choose not to reproduce)
            try:
                scores = smina_score(molecules, receptors)
                finite = [s for s in scores if np.isfinite(s)]
                if finite:
                    out["smina_score"] = float(np.mean(finite))
            except (FileNotFoundError, OSError, RuntimeError,
                    ValueError) as e:
                # smina missing or scoring failure: skip the metric, never
                # sink the training eval
                warnings.warn(f"smina scoring skipped: {e}")
        return out


def build_module_from_config(cfg, node_histogram) -> LigandPocketDDPM:
    return LigandPocketDDPM(
        dataset=cfg.dataset,
        mode=cfg.mode,
        egnn_params=cfg.egnn_params,
        diffusion_params=cfg.diffusion_params,
        node_histogram=node_histogram,
        pocket_representation=cfg.pocket_representation,
        virtual_nodes=cfg.virtual_nodes,
        auxiliary_loss=cfg.auxiliary_loss,
        loss_params=cfg.loss_params,
        n_lig_max=cfg.tpu.n_lig_max,
        n_pocket_max=cfg.tpu.n_pocket_max,
        lig_bucket=cfg.tpu.lig_bucket,
        pocket_bucket=cfg.tpu.pocket_bucket,
        egnn_impl=cfg.tpu.get("egnn_impl", "auto"),
        kernel_tile_i=cfg.tpu.get("kernel_tile_i", 16),
        kernel_sub_j=cfg.tpu.get("kernel_sub_j", 16),
        kernel_skip_mode=cfg.tpu.get("kernel_skip_mode", "bits"),
        kernel_bwd=cfg.tpu.get("kernel_bwd", "auto"),
        kernel_bwd_sub_j=cfg.tpu.get("kernel_bwd_sub_j"),
        kernel_bwd_precision=cfg.tpu.get("kernel_bwd_precision"),
        kernel_block_fuse=cfg.tpu.get("kernel_block_fuse", False),
        compute_dtype=cfg.tpu.get("compute_dtype", "float32"),
        matmul_precision=cfg.tpu.get("matmul_precision", "float32"),
        augment_noise=cfg.get("augment_noise", 0.0),
        augment_rotation=cfg.get("augment_rotation", False),
        nan_check=cfg.tpu.get("nan_check", False),
    )
