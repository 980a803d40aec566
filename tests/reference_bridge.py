"""Bridge for activation/loss/sampler parity tests against the actual
PyTorch reference implementation in /root/reference.

The reference imports a few chemistry packages that are absent in this
environment but unused by the diffusion/EGNN code paths the parity tests
exercise (rdkit, Bio) and torch_scatter (whose two functions are trivially
re-expressed with ``index_add_``).  ``load_reference()`` installs minimal
import stubs and returns the real reference modules.

Also provides padded<->ragged conversion helpers and the noise-injection
subclasses that make both frameworks consume an identical recorded noise
stream (reference noise sites: en_diffusion.py:933-955; ours:
diffsbdd_tpu/diffusion/ddpm.py DDPMBase.sample_gaussian).
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _stub_torch_scatter():
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter_add(src, index, dim=0, dim_size=None):
        if dim_size is None:
            dim_size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = dim_size
        return torch.zeros(shape, dtype=src.dtype).index_add_(dim, index, src)

    def scatter_mean(src, index, dim=0, dim_size=None):
        total = scatter_add(src, index, dim, dim_size)
        count = scatter_add(torch.ones_like(src), index, dim, dim_size)
        return total / count.clamp(min=1)

    mod.scatter_add = scatter_add
    mod.scatter_mean = scatter_mean
    sys.modules["torch_scatter"] = mod


def _stub_chem_deps():
    """Empty-module stubs so `import utils` (reference) succeeds; the parity
    tests only use utils.num_nodes_to_batch_mask, which needs none of them."""
    if "rdkit" not in sys.modules:
        rdkit = types.ModuleType("rdkit")
        chem = types.ModuleType("rdkit.Chem")
        rdkit.Chem = chem
        sys.modules["rdkit"] = rdkit
        sys.modules["rdkit.Chem"] = chem
    if "Bio" not in sys.modules:
        bio = types.ModuleType("Bio")
        pdb = types.ModuleType("Bio.PDB")
        poly = types.ModuleType("Bio.PDB.Polypeptide")
        poly.is_aa = lambda *a, **k: False
        pdb.Polypeptide = poly
        bio.PDB = pdb
        sys.modules["Bio"] = bio
        sys.modules["Bio.PDB"] = pdb
        sys.modules["Bio.PDB.Polypeptide"] = poly


def load_reference():
    """Import and return the reference modules (requires torch)."""
    import importlib.util

    if importlib.util.find_spec("torch") is None:  # pragma: no cover
        raise ImportError("torch unavailable")
    if importlib.util.find_spec("torch_scatter") is None \
            and "torch_scatter" not in sys.modules:
        _stub_torch_scatter()
    _stub_chem_deps()
    # append (not prepend): the reference's top-level utils.py/constants.py
    # must not shadow anything ahead of it on the path
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    from equivariant_diffusion import dynamics as ref_dynamics
    from equivariant_diffusion import egnn_new as ref_egnn
    from equivariant_diffusion import en_diffusion as ref_en_diffusion
    from equivariant_diffusion import conditional_model as ref_conditional

    ns = types.SimpleNamespace(
        dynamics=ref_dynamics, egnn=ref_egnn,
        en_diffusion=ref_en_diffusion, conditional=ref_conditional)
    return ns


# ---------------------------------------------------------------- layouts

def batch_index(sizes):
    """Ragged graph-index vector ('batch mask' in reference terms)."""
    return np.concatenate(
        [np.full(s, b, dtype=np.int64) for b, s in enumerate(sizes)])


def to_ragged(padded, sizes):
    """(B, N, K) padded -> (sum sizes, K) ragged, graph-major order."""
    return np.concatenate(
        [np.asarray(padded)[b, :s] for b, s in enumerate(sizes)], axis=0)


def to_padded(ragged, sizes, n_max):
    """Inverse of to_ragged (zero padding)."""
    ragged = np.asarray(ragged)
    out = np.zeros((len(sizes), n_max) + ragged.shape[1:], ragged.dtype)
    off = 0
    for b, s in enumerate(sizes):
        out[b, :s] = ragged[off:off + s]
        off += s
    return out


def pad_mask(sizes, n_max):
    m = np.zeros((len(sizes), n_max), np.float32)
    for b, s in enumerate(sizes):
        m[b, :s] = 1.0
    return m


# ------------------------------------------------------------ noise queues

def make_queued_ddpm(base_cls):
    """Subclass one of our DDPM classes so every Gaussian draw pops a
    recorded padded array instead of using the PRNG key.  Only valid under
    eager execution (tests run the samplers with jax.disable_jit())."""
    import jax.numpy as jnp

    class Queued(base_cls):
        def set_queue(self, queue):
            self._noise_queue = queue

        def sample_gaussian(self, key, shape, mask):
            arr = self._noise_queue.pop(0)
            assert tuple(arr.shape) == tuple(shape), (arr.shape, shape)
            return jnp.asarray(arr, jnp.float32) * mask[..., None]

    Queued.__name__ = f"Queued{base_cls.__name__}"
    return Queued


def make_queued_ref(base_cls, en_diffusion_mod):
    """Subclass a reference DDPM so its noise draws pop a shared ragged
    queue.  Mirrors the reference draw sites exactly:
    sample_gaussian (en_diffusion.py:953) and
    sample_center_gravity_zero_gaussian_batch (:933)."""
    import torch

    queue: list = []

    class Queued(base_cls):
        @staticmethod
        def sample_gaussian(size, device=None):
            arr = queue.pop(0)
            assert tuple(arr.shape) == tuple(size), (arr.shape, size)
            return torch.as_tensor(arr, dtype=torch.float32)

        @staticmethod
        def sample_center_gravity_zero_gaussian_batch(size, lig_indices,
                                                      pocket_indices):
            arr = queue.pop(0)
            assert tuple(arr.shape) == tuple(size), (arr.shape, size)
            x = torch.as_tensor(arr, dtype=torch.float32)
            return en_diffusion_mod.EnVariationalDiffusion.remove_mean_batch(
                x, torch.cat((lig_indices, pocket_indices)))

    Queued.__name__ = f"Queued{base_cls.__name__}"
    return Queued, queue


class NoiseFeeder:
    """Generates one shared noise stream and pushes it to both frameworks'
    queues in each framework's own draw order."""

    def __init__(self, our_queue, ref_queue, lig_sizes, pkt_sizes,
                 n_lig_max, n_pkt_max, atom_nf, residue_nf, seed=0):
        self.our = our_queue
        self.ref = ref_queue
        self.lig_sizes = list(lig_sizes)
        self.pkt_sizes = list(pkt_sizes)
        self.NL = n_lig_max
        self.NP = n_pkt_max
        self.anf = atom_nf
        self.rnf = residue_nf
        self.B = len(self.lig_sizes)
        self.rng = np.random.default_rng(seed)

    def push_conditional(self, n_events=1):
        """One ligand-only draw of (B, NL, 3+atom_nf) per event
        (conditional_model.py:147-149 / ddpm.py sample_normal_zero_com)."""
        for _ in range(n_events):
            e = self.rng.standard_normal(
                (self.B, self.NL, 3 + self.anf)).astype(np.float32)
            self.our.append(e)
            self.ref.append(to_ragged(e, self.lig_sizes))

    def push_joint(self, n_events=1):
        """One combined-noise event: ours draws 4 padded arrays
        (x_lig, x_pkt, h_lig, h_pkt); the reference draws combined ragged x
        then h_lig then h_pkt (en_diffusion.py:559-578)."""
        for _ in range(n_events):
            ex_l = self.rng.standard_normal((self.B, self.NL, 3)).astype(np.float32)
            ex_p = self.rng.standard_normal((self.B, self.NP, 3)).astype(np.float32)
            eh_l = self.rng.standard_normal((self.B, self.NL, self.anf)).astype(np.float32)
            eh_p = self.rng.standard_normal((self.B, self.NP, self.rnf)).astype(np.float32)
            self.our.extend([ex_l, ex_p, eh_l, eh_p])
            self.ref.append(np.concatenate(
                [to_ragged(ex_l, self.lig_sizes),
                 to_ragged(ex_p, self.pkt_sizes)], axis=0))
            self.ref.append(to_ragged(eh_l, self.lig_sizes))
            self.ref.append(to_ragged(eh_p, self.pkt_sizes))
