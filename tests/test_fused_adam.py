"""Fused Adam+EMA kernel parity vs staged optax (VERDICT r1 item 1c).

Runs the Pallas kernel in interpreter mode on CPU; on TPU the same code
compiles to a single read-modify-write sweep per leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from maskdit_tpu.ops.fused_adam import FusedAdamEma, fused_adam_ema
from maskdit_tpu.train.state import _apply_updates_fused


def tree_allclose(a, b, atol=1e-6):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=1e-6
        ),
        a, b,
    )


def make_tree(rng_seed=0):
    """Leaves chosen to hit both kernel (128-divisible) and jnp fallback."""
    rng = np.random.default_rng(rng_seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return {
        "dense": {"kernel": mk(256, 384), "bias": mk(384)},   # kernel path
        "tiny": {"w": mk(3, 5), "b": mk(7)},                  # jnp fallback
        "scalar": mk(),                                        # jnp fallback
    }


@pytest.mark.parametrize("mode", ["jnp", "interpret"])
@pytest.mark.parametrize("lr", [1e-3, None])  # None -> schedule
def test_fused_matches_optax_over_steps(lr, mode):
    """'interpret' runs the actual Pallas kernel under the interpreter;
    'jnp' is the fallback math used off-TPU."""
    schedule = (lambda step: 1e-3 * (step + 1) / 4.0) if lr is None else lr
    params = make_tree(0)
    ref_params = params
    fused = FusedAdamEma(schedule)
    ref_opt = optax.adam(schedule)
    f_state = fused.init(params)
    r_state = ref_opt.init(ref_params)
    ema = jax.tree.map(lambda p: p, params)
    ref_ema = ema
    decay = 0.995

    for step in range(5):
        grads = make_tree(100 + step)
        params, f_state, ema = fused.update_with_ema(
            grads, f_state, params, ema, ema_decay=decay, mode=mode
        )
        updates, r_state = ref_opt.update(grads, r_state, ref_params)
        ref_params = optax.apply_updates(ref_params, updates)
        ref_ema = optax.incremental_update(ref_params, ref_ema, 1.0 - decay)

    tree_allclose(params, ref_params)
    tree_allclose(ema, ref_ema)
    # optimizer state stays optax-shaped and synchronized
    assert int(f_state[0].count) == int(r_state[0].count) == 5
    tree_allclose(f_state[0].mu, r_state[0].mu)
    tree_allclose(f_state[0].nu, r_state[0].nu)


def test_fused_under_jit_with_donation():
    params = make_tree(1)
    fused = FusedAdamEma(1e-3)
    state = fused.init(params)
    ema = jax.tree.map(lambda p: p, params)

    @jax.jit
    def step(params, state, ema, grads):
        return fused.update_with_ema(grads, state, params, ema)

    grads = make_tree(7)
    p2, s2, e2 = step(params, state, ema, grads)
    p3, s3, e3 = fused.update_with_ema(grads, state, params, ema)
    tree_allclose(p2, p3)
    tree_allclose(e2, e3)


def test_apply_updates_dispatch_and_ema_every():
    """_apply_updates_fused routes FusedAdamEma and honors ema_every."""
    params = make_tree(2)
    fused = FusedAdamEma(1e-3)
    state = fused.init(params)
    ema0 = jax.tree.map(lambda p: p, params)
    grads = make_tree(8)
    decay = 0.9

    # step 0 with ema_every=2 -> (0+1) % 2 != 0 -> EMA untouched
    p1, s1, e1 = _apply_updates_fused(
        fused, params, grads, state, ema0, decay, jnp.asarray(0), ema_every=2
    )
    tree_allclose(e1, ema0)
    # step 1 -> EMA applied with decay^2
    p2, s2, e2 = _apply_updates_fused(
        fused, p1, grads, s1, e1, decay, jnp.asarray(1), ema_every=2
    )
    expected = jax.tree.map(
        lambda e, p: decay ** 2 * e + (1 - decay ** 2) * p, ema0, p2
    )
    tree_allclose(e2, expected)


def test_fused_adam_ema_function_direct():
    """Low-level entry: bias corrections at t=1 are (1-b1), (1-b2)."""
    p = {"w": jnp.ones((128,), jnp.float32)}
    g = {"w": jnp.full((128,), 0.5, jnp.float32)}
    m = {"w": jnp.zeros((128,), jnp.float32)}
    v = {"w": jnp.zeros((128,), jnp.float32)}
    e = {"w": jnp.ones((128,), jnp.float32)}
    new_p, new_m, new_v, new_e = fused_adam_ema(
        g, p, m, v, e, lr=jnp.asarray(0.1), count_inc=jnp.asarray(1),
        b1=0.9, b2=0.999, eps=1e-8, ema_decay=0.5,
    )
    # m_hat = 0.5, v_hat = 0.25 -> p - 0.1 * 0.5/(0.5 + 1e-8)
    np.testing.assert_allclose(np.asarray(new_p["w"]), 1.0 - 0.1 * 0.5 / (0.5 + 1e-8), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_e["w"]), 0.5 * 1.0 + 0.5 * np.asarray(new_p["w"]), rtol=1e-6)


@pytest.mark.parametrize("mode", ["jnp", "interpret"])
def test_bf16_mu_tracks_fp32(mode):
    """mu_dtype='bfloat16' stores the first moment narrower; the math
    stays fp32 so params must track the fp32-state run within the bf16
    rounding of m (relative ~2^-8 of an m whose per-step increment is
    (1-b1)=10%) — and the state tree must really be bf16."""
    params32 = make_tree(0)
    params16 = make_tree(0)
    full = FusedAdamEma(1e-3)
    narrow = FusedAdamEma(1e-3, mu_dtype=jnp.bfloat16)
    s32, s16 = full.init(params32), narrow.init(params16)
    for leaf in jax.tree.leaves(s16[0].mu):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(s16[0].nu):
        assert leaf.dtype == jnp.float32
    ema32 = jax.tree.map(lambda p: p, params32)
    ema16 = jax.tree.map(lambda p: p, params16)

    for step in range(8):
        grads = make_tree(200 + step)
        params32, s32, ema32 = full.update_with_ema(
            grads, s32, params32, ema32, ema_decay=0.995, mode=mode
        )
        params16, s16, ema16 = narrow.update_with_ema(
            grads, s16, params16, ema16, ema_decay=0.995, mode=mode
        )

    for leaf in jax.tree.leaves(s16[0].mu):
        assert leaf.dtype == jnp.bfloat16
    # per-step param deviation is bounded by lr * (bf16 rounding of the
    # normalized update) ~ lr * 0.4%; over 8 steps allow 8x headroom
    lr = 1e-3
    for a, b in zip(jax.tree.leaves(params32), jax.tree.leaves(params16)):
        dev = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(dev) < 0.01 * lr, np.median(dev)
        assert dev.max() < 0.2 * lr, dev.max()


def test_stochastic_round_bf16_unbiased_and_exact():
    """SR to bf16: exactly-representable values pass through bit-exact;
    in-between values round up with probability == their fractional
    position between the two bracketing bf16 values (unbiased)."""
    from maskdit_tpu.ops.fused_adam import stochastic_round_bf16

    key = jax.random.PRNGKey(0)
    # exact: bf16 values have zero low mantissa bits -> never perturbed
    exact = jnp.asarray([1.0, -2.0, 0.0, 0.00390625], jnp.float32)
    out = stochastic_round_bf16(jnp.broadcast_to(exact, (64, 4)), key)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.broadcast_to(np.asarray(exact), (64, 4))
    )

    # unbiased: x = lo + f * (hi - lo) must average back to x
    lo = np.float32(1.0)
    gap = np.float32(2.0 ** -7)  # the bf16 ulp at 1.0 (7 mantissa bits)
    for f in (0.25, 0.5, 0.75):
        x = jnp.full((1 << 16,), lo + f * gap, jnp.float32)
        got = stochastic_round_bf16(x, key).astype(jnp.float32)
        mean = float(jnp.mean(got))
        # std of the mean ~ gap * sqrt(f(1-f)/n) ~ gap * 0.002
        assert abs(mean - float(lo + f * gap)) < 0.02 * gap, (f, mean)
        # every sample is one of the two bracketing values
        assert set(np.unique(np.asarray(got, np.float32))) <= {
            float(lo), float(lo + gap)
        }


def test_narrow_nu_without_sr_key_raises():
    """Round-to-nearest narrow nu storage is a silent-freeze bug; the
    jnp leaf update refuses it without a stochastic-rounding key."""
    p = {"w": jnp.ones((128,), jnp.float32)}
    g = {"w": jnp.full((128,), 0.5, jnp.float32)}
    m = {"w": jnp.zeros((128,), jnp.float32)}
    v = {"w": jnp.zeros((128,), jnp.bfloat16)}
    e = {"w": jnp.ones((128,), jnp.float32)}
    with pytest.raises(ValueError, match="stochastic rounding"):
        fused_adam_ema(
            g, p, m, v, e, lr=jnp.asarray(0.1), count_inc=jnp.asarray(1),
            b1=0.9, b2=0.999, eps=1e-8, ema_decay=0.5,
        )


def test_bf16_nu_sr_tracks_fp32():
    """nu_dtype='bfloat16' with stochastic rounding: nu stays within a
    few % of the fp32 run (the documented ~2.5% stationary noise), the
    params track within small multiples of lr, and the rounding is
    deterministic in the step count (resume-reproducible)."""
    params32 = make_tree(0)
    params16 = make_tree(0)
    full = FusedAdamEma(1e-3)
    narrow = FusedAdamEma(1e-3, nu_dtype=jnp.bfloat16)
    s32, s16 = full.init(params32), narrow.init(params16)
    for leaf in jax.tree.leaves(s16[0].nu):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(s16[0].mu):
        assert leaf.dtype == jnp.float32
    ema32 = jax.tree.map(lambda p: p, params32)
    ema16 = jax.tree.map(lambda p: p, params16)

    # determinism: the same (state, grads) update twice gives identical nu
    g0 = make_tree(300)
    pa, sa, ea = narrow.update_with_ema(g0, s16, params16, ema16)
    pb, sb, eb = narrow.update_with_ema(g0, s16, params16, ema16)
    for a, b in zip(jax.tree.leaves(sa[0].nu), jax.tree.leaves(sb[0].nu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lr = 1e-3
    for step in range(20):
        grads = make_tree(300 + step)
        params32, s32, ema32 = full.update_with_ema(
            grads, s32, params32, ema32, ema_decay=0.995
        )
        params16, s16, ema16 = narrow.update_with_ema(
            grads, s16, params16, ema16, ema_decay=0.995
        )

    for leaf in jax.tree.leaves(s16[0].nu):
        assert leaf.dtype == jnp.bfloat16
    # nu relative error: SR noise stationary std ~2.5%; allow wide tails
    for a, b in zip(jax.tree.leaves(s32[0].nu), jax.tree.leaves(s16[0].nu)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-12)
        assert np.median(rel) < 0.02, np.median(rel)
        assert rel.max() < 0.15, rel.max()
    # params: nu noise enters under a sqrt -> ~1.25% of each lr-sized step
    for a, b in zip(jax.tree.leaves(params32), jax.tree.leaves(params16)):
        dev = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(dev) < 0.05 * lr, np.median(dev)
        assert dev.max() < 1.0 * lr, dev.max()
    # the EMA stays exact fp32 storage
    for leaf in jax.tree.leaves(ema16):
        assert leaf.dtype == jnp.float32


def test_nu_dtype_plumbing_and_guards():
    """make_optimizer threads nu_dtype to both the fused optimizer and
    the staged-optax (sharded-path) construction; misuse raises."""
    from maskdit_tpu.train.state import make_optimizer

    params = make_tree(1)
    opt = make_optimizer(
        1e-4, global_batch_size=8, fused="jnp", nu_dtype="bfloat16"
    )
    state = opt.init(params)
    for leaf in jax.tree.leaves(state[0].nu):
        assert leaf.dtype == jnp.bfloat16
    with pytest.raises(NotImplementedError, match="fused"):
        opt.update(make_tree(2), state, params)
    with pytest.raises(ValueError, match="bfloat16"):
        FusedAdamEma(1e-3, nu_dtype=jnp.float16)
    with pytest.raises(NotImplementedError, match="weight_decay"):
        make_optimizer(
            1e-4, global_batch_size=8, weight_decay=0.01, nu_dtype="bfloat16"
        )
    # jitted update with donation still works with the narrow nu state
    @jax.jit
    def step(params, state, ema, grads):
        return opt.update_with_ema(grads, state, params, ema)

    ema = jax.tree.map(lambda p: p, params)
    p2, s2, e2 = step(params, state, ema, make_tree(3))
    for leaf in jax.tree.leaves(s2[0].nu):
        assert leaf.dtype == jnp.bfloat16
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p2)
    )


def test_adam_sr_nu_matches_fused_and_optax():
    """The staged transform (sharded path) produces the same params as
    FusedAdamEma(nu_dtype) given the same grads — both track plain fp32
    optax.adam within the documented SR noise, and their state trees are
    optax-shaped with narrow nu."""
    from maskdit_tpu.train.state import make_optimizer

    params_ref = make_tree(0)
    params_sr = make_tree(0)
    ref = optax.adam(1e-3)
    sr = make_optimizer(
        1e-3, global_batch_size=8, fused=False, nu_dtype="bfloat16"
    )
    s_ref, s_sr = ref.init(params_ref), sr.init(params_sr)
    for leaf in jax.tree.leaves(s_sr[0].nu):
        assert leaf.dtype == jnp.bfloat16
    for step in range(10):
        grads = make_tree(400 + step)
        u_ref, s_ref = ref.update(grads, s_ref, params_ref)
        params_ref = optax.apply_updates(params_ref, u_ref)
        u_sr, s_sr = sr.update(grads, s_sr, params_sr)
        params_sr = optax.apply_updates(params_sr, u_sr)
    lr = 1e-3
    for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_sr)):
        dev = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(dev) < 0.05 * lr, np.median(dev)
        assert dev.max() < 1.0 * lr, dev.max()
    # same-count SR determinism: staged and fused use the same key
    # schedule, so their nu trees agree bit-for-bit given equal inputs
    fused = FusedAdamEma(1e-3, nu_dtype=jnp.bfloat16)
    params_f = make_tree(0)
    s_f = fused.init(params_f)
    ema = jax.tree.map(lambda p: p, params_f)
    params_s = make_tree(0)
    s_s = sr.init(params_s)
    g = make_tree(500)
    params_f, s_f, ema = fused.update_with_ema(g, s_f, params_f, ema)
    u, s_s = sr.update(g, s_s, params_s)
    params_s = optax.apply_updates(params_s, u)
    for a, b in zip(jax.tree.leaves(s_f[0].nu), jax.tree.leaves(s_s[0].nu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tree_allclose(params_f, params_s, atol=1e-6)


def test_make_optimizer_moment_dtype_plumbing():
    """moment_dtype reaches both the fused and plain-optax constructions."""
    from maskdit_tpu.train.state import make_optimizer

    params = make_tree(1)
    for fused in ("jnp", False):
        opt = make_optimizer(
            1e-4, global_batch_size=8, fused=fused, moment_dtype="bfloat16"
        )
        state = opt.init(params)
        for leaf in jax.tree.leaves(state[0].mu):
            assert leaf.dtype == jnp.bfloat16
        for leaf in jax.tree.leaves(state[0].nu):
            assert leaf.dtype == jnp.float32


def test_moment_dtype_switch_across_restore(tmp_path):
    """A checkpoint saved with fp32 Adam state restores into a bf16-mu
    optimizer (and back): orbax StandardRestore casts leaves to the
    abstract state's dtypes, so train.moment_dtype can be flipped
    mid-run without invalidating checkpoints."""
    import orbax.checkpoint as ocp

    from maskdit_tpu.train.state import make_optimizer

    params = make_tree(3)
    opt32 = make_optimizer(1e-4, global_batch_size=8, fused=False)
    opt16 = make_optimizer(
        1e-4, global_batch_size=8, fused=False, moment_dtype="bfloat16"
    )
    s32 = opt32.init(params)
    mgr = ocp.CheckpointManager(tmp_path / "ck")
    mgr.save(0, args=ocp.args.StandardSave(s32))
    mgr.wait_until_finished()
    restored = mgr.restore(
        0, args=ocp.args.StandardRestore(jax.eval_shape(opt16.init, params))
    )
    for leaf in jax.tree.leaves(restored[0].mu):
        assert leaf.dtype == jnp.bfloat16
    for a, b in zip(jax.tree.leaves(restored[0].mu), jax.tree.leaves(s32[0].mu)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b), rtol=8e-3, atol=1e-6
        )
    # and the narrow state feeds a working update
    grads = make_tree(4)
    updates, _ = opt16.update(grads, restored, params)
    assert all(np.isfinite(np.asarray(u)).all() for u in jax.tree.leaves(updates))
