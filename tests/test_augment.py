"""Training-time augmentation (augment_noise / augment_rotation).

The reference accepts both config options but leaves them unimplemented
(lightning_modules.py:338-347); here they are functional, so these tests pin
the intended semantics: uniform rigid rotations applied consistently to
ligand+pocket, and joint-CoM-free Gaussian jitter.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffsbdd_tpu.train.augment import augment_batch, random_rotation_matrices

from test_train import B, NL, NP, make_batch, tiny_config
from diffsbdd_tpu.train.module import build_module_from_config


def _module(**over):
    cfg = tiny_config(**over)
    hist = np.ones((NL + 1, NP + 1))
    return cfg, build_module_from_config(cfg, hist)


def test_random_rotations_are_valid_and_uniformish():
    R = np.asarray(random_rotation_matrices(jax.random.PRNGKey(0), 256))
    eye = np.eye(3)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                               np.broadcast_to(eye, R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Haar measure: E[R] = 0 and E[trace] = 0 for uniform SO(3)
    assert np.abs(R.mean(0)).max() < 0.15
    assert abs(np.trace(R.mean(0))) < 0.3


def test_rotation_augmentation_is_rigid_and_consistent():
    _, module = _module()
    ligand, pocket = make_batch(jax.random.PRNGKey(1), module)
    lig2, pkt2 = augment_batch(jax.random.PRNGKey(2), ligand, pocket,
                               augment_noise=0.0, augment_rotation=True)

    def dmat(a, b):
        return np.linalg.norm(np.asarray(a)[:, :, None] -
                              np.asarray(b)[:, None], axis=-1)

    # all pairwise distances preserved, within and across domains ->
    # one rigid rotation applied consistently to both node sets
    np.testing.assert_allclose(dmat(lig2["x"], lig2["x"]),
                               dmat(ligand["x"], ligand["x"]), atol=1e-4)
    np.testing.assert_allclose(dmat(lig2["x"], pkt2["x"]),
                               dmat(ligand["x"], pocket["x"]), atol=1e-4)
    # padded nodes stay at the origin
    pad = 1.0 - np.asarray(ligand["mask"])[..., None]
    assert np.abs(np.asarray(lig2["x"]) * pad).max() == 0.0
    # coordinates actually moved
    assert np.abs(np.asarray(lig2["x"]) - np.asarray(ligand["x"])).max() > 0.1


def test_noise_augmentation_is_joint_com_free():
    _, module = _module()
    ligand, pocket = make_batch(jax.random.PRNGKey(3), module)
    sigma = 0.25
    lig2, pkt2 = augment_batch(jax.random.PRNGKey(4), ligand, pocket,
                               augment_noise=sigma, augment_rotation=False)
    d_l = np.asarray(lig2["x"] - ligand["x"])
    d_p = np.asarray(pkt2["x"] - pocket["x"])
    # perturbation CoM over the combined system is zero per graph
    com = d_l.sum(1) + d_p.sum(1)
    np.testing.assert_allclose(com, 0.0, atol=1e-4)
    # magnitude matches sigma (loose statistical bound)
    m_l = np.asarray(ligand["mask"])
    rms = np.sqrt((d_l ** 2).sum() / (m_l.sum() * 3))
    assert 0.5 * sigma < rms < 1.5 * sigma
    # padded slots untouched
    pad = 1.0 - m_l[..., None]
    assert np.abs(d_l * pad).max() == 0.0


def test_augmentation_changes_training_loss_but_not_eval():
    cfg0, module0 = _module()
    _, module1 = _module(augment_noise=0.5, augment_rotation=True)
    ligand, pocket = make_batch(jax.random.PRNGKey(5), module0)
    params = module0.init_params(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    loss0, _ = module0.loss_fn(params, rng, ligand, pocket, training=True)
    loss1, _ = module1.loss_fn(params, rng, ligand, pocket, training=True)
    assert not np.allclose(float(loss0), float(loss1)), \
        "augmentation flags must change the training loss trajectory"

    # eval path ignores augmentation
    e0, _ = module0.loss_fn(params, rng, ligand, pocket, training=False)
    e1, _ = module1.loss_fn(params, rng, ligand, pocket, training=False)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-6)


def test_rotation_augmented_loss_matches_manual_rotation():
    """With an equivariant model, rotating the inputs must reproduce the
    augmented loss exactly when the same PRNG stream is used."""
    _, module = _module(augment_rotation=True)
    ligand, pocket = make_batch(jax.random.PRNGKey(8), module)
    params = module.init_params(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(9)

    loss_aug, _ = module.loss_fn(params, rng, ligand, pocket, training=True)

    # replicate the internal augmentation by hand with the same keys
    rng2, k_aug = jax.random.split(rng)
    lig_rot, pkt_rot = augment_batch(k_aug, ligand, pocket, 0.0, True)
    module.augment_rotation = False
    # the module consumed (rng -> split -> k_aug); the remaining stream is rng2
    loss_manual, _ = module.loss_fn(params, rng2, lig_rot, pkt_rot,
                                    training=True)
    np.testing.assert_allclose(float(loss_aug), float(loss_manual), rtol=1e-6)
