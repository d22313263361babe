"""Golden tests for the composed hot loops: cross_reconstruct (hot loop C)
and the joint training batch (hot loop B) vs. NumPy oracle compositions,
under deterministic RNG. Pins the exact wiring of SURVEY.md §2.1(10)/(11),
not just the RBM-level pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_idbn_tpu.ops import imdbn_ops, rbm_ops

from oracle_np import OracleRBM, sigmoid

Dz, K, Hj = 12, 4, 10
V = Dz + K
B = 6
GROUPS = ((Dz, Dz + K),)
KEY = jax.random.key(0)


@pytest.fixture
def det_random(monkeypatch):
    def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0,
                     maxval=1.0):
        return jnp.full(shape, 0.5, dtype)

    def fake_normal(key, shape=(), dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    def fake_categorical(key, logits, axis=-1, shape=None):
        return jnp.argmax(logits, axis=axis)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    monkeypatch.setattr(jax.random, "normal", fake_normal)
    monkeypatch.setattr(jax.random, "categorical", fake_categorical)


def make_models(seed=0):
    rng = np.random.RandomState(seed)
    jw = rng.randn(V, Hj).astype(np.float32) / np.sqrt(V)
    jhb = (0.1 * rng.randn(Hj)).astype(np.float32)
    jvb = (0.1 * rng.randn(V)).astype(np.float32)
    joint = rbm_ops.RBMState(jnp.asarray(jw), jnp.asarray(jhb),
                             jnp.asarray(jvb), jnp.zeros((V, Hj)),
                             jnp.zeros(Hj), jnp.zeros(V))
    ojoint = OracleRBM(jw, jhb, jvb, groups=GROUPS, weight_decay=1e-4)

    # one-layer image DBN: 20 visible -> Dz hidden
    iw = rng.randn(20, Dz).astype(np.float32) / np.sqrt(20)
    ihb = (0.1 * rng.randn(Dz)).astype(np.float32)
    ivb = (0.1 * rng.randn(20)).astype(np.float32)
    idbn = (rbm_ops.RBMState(jnp.asarray(iw), jnp.asarray(ihb),
                             jnp.asarray(ivb), jnp.zeros((20, Dz)),
                             jnp.zeros(Dz), jnp.zeros(20)),)
    oimg = OracleRBM(iw, ihb, ivb)

    z = rng.rand(B, Dz).astype(np.float32)
    y = np.eye(K, dtype=np.float32)[rng.randint(0, K, B)]
    zcm = rng.rand(K, Dz).astype(np.float32)
    img = (rng.rand(B, 20) > 0.5).astype(np.float32)
    return joint, ojoint, idbn, oimg, z, y, zcm, img


def oracle_cross_reconstruct(ojoint, oimg, z, y, zcm, steps):
    """Reference imdbn.py:387-488 composed from oracle pieces (candidate 0
    always wins — degenerate best-of-K)."""
    vk = np.zeros((B, V), np.float32)
    km = np.zeros((B, V), np.float32)
    vk[:, :Dz] = z
    km[:, :Dz] = 1.0
    v_i2t = ojoint.conditional_gibbs(vk, km, steps, sample_h=False,
                                     sample_v=False)
    p_y = v_i2t[:, Dz:]

    vk2 = np.zeros((B, V), np.float32)
    vk2[:, Dz:] = y
    km2 = 1.0 - km
    mu_k = zcm[y.argmax(1)]
    v_chain = ojoint.noisy_meanfield_annealed(
        vk2, km2, n_steps=steps, T0=3.0, T1=1.0, sigma0=0.9, sharpen_last=3,
        T_cold_plus=0.9, mu_k=mu_k, eta0=0.15)
    z_from_y = v_chain[:, :Dz]
    img = sigmoid(z_from_y @ oimg.w.T + oimg.vb)  # decode, no groups
    return img, p_y


def test_cross_reconstruct_matches_oracle(det_random):
    joint, ojoint, idbn, oimg, z, y, zcm, _ = make_models()
    img_j, p_j = imdbn_ops.cross_reconstruct(
        joint, idbn, KEY, jnp.asarray(z), jnp.asarray(y), steps=7, Dz=Dz,
        groups=GROUPS, z_class_mean=jnp.asarray(zcm), use_free_energy=False)
    img_o, p_o = oracle_cross_reconstruct(ojoint, oimg, z, y, zcm, steps=7)
    np.testing.assert_allclose(np.asarray(p_j), p_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img_j), img_o, rtol=1e-4,
                               atol=1e-4)


def test_cross_reconstruct_with_affine(det_random):
    joint, ojoint, idbn, oimg, z, y, zcm, _ = make_models(1)
    scale = np.full(Dz, 2.0, np.float32)
    bias = np.full(Dz, 0.1, np.float32)
    img_j, _ = imdbn_ops.cross_reconstruct(
        joint, idbn, KEY, jnp.asarray(z), jnp.asarray(y), steps=4, Dz=Dz,
        groups=GROUPS, z_class_mean=jnp.asarray(zcm),
        z_affine=(jnp.asarray(scale), jnp.asarray(bias)),
        use_free_energy=False)
    # oracle with affine inverse (imdbn.py:481-484)
    vk2 = np.zeros((B, V), np.float32)
    vk2[:, Dz:] = y
    km2 = np.zeros((B, V), np.float32)
    km2[:, Dz:] = 1.0
    v_chain = ojoint.noisy_meanfield_annealed(
        vk2, km2, n_steps=4, T0=3.0, T1=1.0, sigma0=0.9, sharpen_last=3,
        T_cold_plus=0.9, mu_k=zcm[y.argmax(1)], eta0=0.15)
    z_aff = (v_chain[:, :Dz] - bias) / (scale + 1e-6)
    img_o = sigmoid(z_aff @ oimg.w.T + oimg.vb)
    np.testing.assert_allclose(np.asarray(img_j), img_o, rtol=1e-4,
                               atol=1e-4)


def oracle_joint_batch_main(ojoint, z, y, zcm, joint_cd, aux_steps):
    """Main-epoch joint batch (reference imdbn.py:582-612, b_idx=0 so the
    z-clamp aux fires)."""
    v_plus = np.concatenate([z, y], 1)
    ojoint.cd_update(v_plus, lr=0.04, mom=0.5, cd=joint_cd)
    vk = np.zeros((B, V), np.float32)
    km = np.zeros((B, V), np.float32)
    vk[:, Dz:] = y
    km[:, Dz:] = 1.0
    ojoint.clamped_cd_update(vk, km, lr=0.04, mom=0.5, cd=1,
                             cond_init_steps=aux_steps, sample_h=False,
                             sample_v=False, reclamp_negative=False,
                             aux_lr_mult=0.3, use_noisy_init=True)
    vk2 = np.zeros((B, V), np.float32)
    vk2[:, :Dz] = z
    ojoint.clamped_cd_update(vk2, 1.0 - km, lr=0.04, mom=0.5, cd=1,
                             cond_init_steps=aux_steps, sample_h=False,
                             sample_v=False, reclamp_negative=False,
                             aux_lr_mult=0.3, use_noisy_init=True)


def test_joint_train_batch_matches_oracle(det_random):
    """Hot loop B: one main-epoch batch (free CD + y-aux + z-aux at
    b_idx=0) produces the same joint parameters as the oracle
    composition. Note cond_init_steps floors at 10 inside clamped CD
    (rbm.py:446)."""
    joint, ojoint, idbn, oimg, z, y, zcm, img = make_models(2)
    new_joint, cd_loss, metrics = imdbn_ops._joint_train_batch(
        joint, idbn, KEY, jnp.asarray(z), jnp.asarray(y),
        jnp.asarray(img), jnp.asarray(0), 0.04, 0.5, 1e-4,
        jnp.asarray(zcm), warmup=False, joint_cd=2, aux_cond_steps=4,
        Dz=Dz, steps=3, groups=GROUPS, use_free_energy=False,
        zclamp_every=50, compute_metrics=False)
    oracle_joint_batch_main(ojoint, z, y, zcm, joint_cd=2, aux_steps=4)
    np.testing.assert_allclose(np.asarray(new_joint.w), ojoint.w,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_joint.vb), ojoint.vb,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_joint.hb), ojoint.hb,
                               rtol=2e-4, atol=2e-4)


def test_joint_warmup_batch_matches_oracle(det_random):
    """Warmup batch: 2x y-clamped aux CD only (imdbn.py:566-579)."""
    joint, ojoint, idbn, oimg, z, y, zcm, img = make_models(3)
    new_joint, cd_loss, _ = imdbn_ops._joint_train_batch(
        joint, idbn, KEY, jnp.asarray(z), jnp.asarray(y),
        jnp.asarray(img), jnp.asarray(0), 0.04, 0.5, 1e-4,
        jnp.asarray(zcm), warmup=True, joint_cd=1, aux_cond_steps=4,
        Dz=Dz, steps=3, groups=GROUPS, use_free_energy=False,
        zclamp_every=50, compute_metrics=False)
    vk = np.zeros((B, V), np.float32)
    km = np.zeros((B, V), np.float32)
    vk[:, Dz:] = y
    km[:, Dz:] = 1.0
    for _ in range(2):
        ojoint.clamped_cd_update(vk, km, lr=0.04, mom=0.5, cd=1,
                                 cond_init_steps=4, sample_h=False,
                                 sample_v=False, reclamp_negative=True,
                                 aux_lr_mult=0.3, use_noisy_init=True)
    assert float(cd_loss) == 0.0  # no free CD during warmup
    np.testing.assert_allclose(np.asarray(new_joint.w), ojoint.w,
                               rtol=2e-4, atol=2e-4)


def _oracle_candidates(ojoint, y, zcm, steps):
    vk2 = np.zeros((B, V), np.float32)
    vk2[:, Dz:] = y
    km2 = np.zeros((B, V), np.float32)
    km2[:, Dz:] = 1.0
    mu_k = zcm[y.argmax(1)]
    cands = [ojoint.noisy_meanfield_annealed(
        vk2, km2, n_steps=steps, T0=3.0, T1=1.0, sigma0=0.9,
        sharpen_last=3, T_cold_plus=0.9, mu_k=mu_k, eta0=0.15)]
    for _ in range(4):
        cands.append(ojoint.noisy_meanfield_annealed(
            cands[-1], km2, n_steps=1, T0=0.9, T1=0.9, sigma0=0.0,
            sharpen_last=0, T_cold_plus=0.9, mu_k=mu_k, eta0=0.15))
    F = np.stack([ojoint.free_energy(c) for c in cands])  # [5, B]
    return cands, F.argmin(0)


def test_best_of_k_free_energy_selection(det_random):
    """use_free_energy=True must pick the per-sample argmin-free-energy
    candidate among [annealed chain, 4 cold refinements] (the reference's
    intended-but-broken selector, SURVEY.md §2.1(10))."""
    # find a seed whose oracle selection is non-trivial (some sample
    # prefers a refinement over the full chain)
    for seed in range(5, 30):
        joint, ojoint, idbn, oimg, z, y, zcm, _ = make_models(seed)
        cands, best = _oracle_candidates(ojoint, y, zcm, steps=5)
        if (best > 0).any():
            break
    else:
        pytest.skip("no non-trivial selection seed found")

    img_j, _ = imdbn_ops.cross_reconstruct(
        joint, idbn, KEY, jnp.asarray(z), jnp.asarray(y), steps=5, Dz=Dz,
        groups=GROUPS, z_class_mean=jnp.asarray(zcm), use_free_energy=True,
        best_of_k=5)
    v_pick = np.stack([cands[best[b]][b] for b in range(B)])
    from oracle_np import sigmoid
    img_o = sigmoid(v_pick[:, :Dz] @ oimg.w.T + oimg.vb)
    np.testing.assert_allclose(np.asarray(img_j), img_o, rtol=2e-4,
                               atol=2e-4)
    assert (best > 0).any()  # selection exercised beyond candidate 0
