"""Memory-envelope regression tests (the guard round 3 lacked).

Round 3's bench died with RESOURCE_EXHAUSTED on the chip: the ensemble
scans stacked their trace time-major and transposed it to chain-major on
device (double materialisation, ~15.4 GB at the bench shape), and the
thinned path stacked whole (thin, C, D) windows as inner-scan ys just to
keep row [-1] (~15 GB for the bench's thin=600 warmup chunk).  Both are
now written in place into a carried chain-major buffer
(samplers/tracebuf.py); these tests pin the envelope with
``compiled.memory_analysis()`` — CPU-runnable, no 16 GB device needed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GB = 2.0**30


def _mem(compiled):
    ma = compiled.memory_analysis()
    return (
        ma.temp_size_in_bytes / GB,
        ma.output_size_in_bytes / GB,
        ma.argument_size_in_bytes / GB,
    )


class TestScanTraceEquivalence:
    """tracebuf.scan_trace must be a pure layout change: bit-identical
    values to the plain time-major scan + swapaxes it replaces."""

    def _step(self):
        def step(carry, x):
            n, flag_a, flag_b = x
            state, acc = carry
            state = state * 0.9 + jnp.sin(n.astype(jnp.float32) + state)
            acc = acc + jnp.sum(state)
            info = {"n": n, "mean": jnp.mean(state), "flag": flag_a | flag_b}
            return (state, acc), (state, info)

        state0 = jnp.arange(12.0).reshape(3, 4)  # (C=3, D=4) chain block
        carry0 = (state0, jnp.zeros(()))
        n = 12
        xs = (
            jnp.arange(n),
            jnp.zeros(n, bool).at[5].set(True),
            jnp.zeros(n, bool),
        )
        return step, carry0, xs

    def test_chain_major_unthinned_matches_swapaxes(self):
        from hamiltorch_tpu.samplers.tracebuf import scan_trace

        step, carry0, xs = self._step()
        carry_ref, (trace_ref, aux_ref) = jax.lax.scan(step, carry0, xs)
        carry, trace, aux = scan_trace(
            step, carry0, xs, chain_major=True, state_like=carry0[0]
        )
        np.testing.assert_array_equal(trace, jnp.swapaxes(trace_ref, 0, 1))
        for a, b in zip(
            jax.tree_util.tree_leaves((carry, aux)),
            jax.tree_util.tree_leaves((carry_ref, aux_ref)),
        ):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("chain_major", [False, True])
    def test_thinned_keeps_window_last(self, chain_major):
        from hamiltorch_tpu.samplers.tracebuf import scan_trace

        step, carry0, xs = self._step()
        thin = 3
        carry_ref, (trace_ref, aux_ref) = jax.lax.scan(step, carry0, xs)

        def reduce(aux_w):
            kept = jax.tree_util.tree_map(lambda a: a[-1], aux_w)
            kept["flag"] = jnp.any(aux_w["flag"])
            return kept

        carry, trace, aux = scan_trace(
            step, carry0, xs, thin=thin, chain_major=chain_major,
            aux_reduce=reduce, state_like=carry0[0],
        )
        expect = trace_ref[thin - 1 :: thin]
        if chain_major:
            expect = jnp.swapaxes(expect, 0, 1)
        np.testing.assert_array_equal(trace, expect)
        np.testing.assert_array_equal(aux["n"], aux_ref["n"][thin - 1 :: thin])
        # window-aggregated flag: any within each window
        np.testing.assert_array_equal(
            aux["flag"], aux_ref["flag"].reshape(-1, thin).any(axis=1)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(carry), jax.tree_util.tree_leaves(carry_ref)
        ):
            np.testing.assert_array_equal(a, b)

    def test_thin_must_divide(self):
        from hamiltorch_tpu.samplers.tracebuf import scan_trace

        step, carry0, xs = self._step()
        with pytest.raises(ValueError, match="divisible"):
            scan_trace(step, carry0, xs, thin=5, state_like=carry0[0])


class TestBenchShapeEnvelope:
    """AOT-compile the EXACT programs bench.py runs (64 chains x 100,352
    params) and pin their HBM envelope.  On round-3 HEAD the sampling chunk
    compiled to ~7.7 GB temp + 7.7 GB output (the transpose relayout) and
    the warmup chunk to ~15 GB temp (the thin-window stacking) — either
    assertion below would have failed before tracebuf.scan_trace."""

    def _bench_programs(self):
        from hamiltorch_tpu.models.flagship import make_flagship_potential
        from hamiltorch_tpu.ops.mass import make_mass
        from hamiltorch_tpu.ops.potential import resolve_potential
        from hamiltorch_tpu.samplers.adaptation import DualAveragingState
        from hamiltorch_tpu.samplers.chees import (
            ChEESCarry,
            ChEESConfig,
            _run_chees_jit,
        )
        from hamiltorch_tpu.samplers.warmup import schedule_flags

        lp_raw, theta0 = make_flagship_potential()
        c, d = 64, theta0.shape[0]
        cfg = ChEESConfig(
            num_samples=900, step_size=2e-4, burn=600, adapt_mass=True,
            init_trajectory_length=0.01,
        )
        cfg_warm = dataclasses.replace(cfg, num_samples=600, thin=600)
        cfg_samp = dataclasses.replace(cfg, num_samples=300, thin=1)
        lp, data = resolve_potential(lp_raw, None)
        mass = make_mass(None, d)
        cf_w, ef_w = schedule_flags(cfg.burn, 0, 600)
        cf_s, ef_s = schedule_flags(cfg.burn, 600, 300)
        key = jax.random.key(0)
        f32 = jnp.float32
        z = jnp.zeros
        thetas0 = z((c, d), f32)
        warm = _run_chees_jit.lower(
            key, thetas0, lp, cfg_warm, mass, data=data,
            collect_flags=cf_w, end_flags=ef_w,
        ).compile()
        carry = ChEESCarry(
            thetas=thetas0, logps=z((c,), f32), grads=z((c, d), f32),
            da=DualAveragingState(
                step_size=z((), f32), log_eps_bar=z((), f32),
                h_t=z((), f32), mu=z((), f32),
            ),
            log_t=z((), f32), adam_m=z((), f32), adam_v=z((), f32),
            wf_count=z((), f32), wf_mean=z((d,), f32), wf_m2=z((d,), f32),
            metric=jnp.ones((d,), f32), da_t=z((), jnp.int32),
        )
        samp = _run_chees_jit.lower(
            key, thetas0, lp, cfg_samp, mass, data=data,
            init_carry=carry, start_iter=600,
            collect_flags=cf_s, end_flags=ef_s,
        ).compile()
        return warm, samp

    def test_chees_bench_chunks_fit(self):
        warm, samp = self._bench_programs()
        for name, compiled, out_hi in [("warmup", warm, 1.0), ("sampling", samp, 8.0)]:
            temp, out, arg = _mem(compiled)
            # no second trace materialisation anywhere: temps are bounded by
            # the live chain state (~hundreds of MB), not the (C, N, D) trace
            assert temp < 1.5, f"{name} chunk temp {temp:.2f} GB (trace copy?)"
            assert out < out_hi, f"{name} chunk output {out:.2f} GB"
            assert temp + out + arg < 9.0, (
                f"{name} chunk peak {temp + out + arg:.2f} GB exceeds the "
                "16 GB-HBM-with-headroom envelope (VERDICT r3 item 2)"
            )

    def test_nuts_ensemble_envelope(self):
        """Pooled-NUTS ensemble at the flagship width: temps stay at live-
        state scale — the pre-fix relayout would put a full trace copy
        (= output size) in temp."""
        from hamiltorch_tpu.models.flagship import make_flagship_potential
        from hamiltorch_tpu.ops.mass import make_mass
        from hamiltorch_tpu.ops.potential import resolve_potential
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, _run_nuts_ensemble_jit

        lp_raw, theta0 = make_flagship_potential()
        c, d = 16, theta0.shape[0]
        cfg = NUTSConfig(num_samples=64, step_size=1e-3, burn=0,
                         adapt_step_size=False, max_tree_depth=6)
        lp, data = resolve_potential(lp_raw, None)
        mass = make_mass(None, d)
        compiled = _run_nuts_ensemble_jit.lower(
            jax.random.key(0), jnp.zeros((c, d), jnp.float32), lp, cfg, mass,
            data=data,
        ).compile()
        temp, out, arg = _mem(compiled)
        trace_gb = c * 64 * d * 4 / GB  # (C, N, D) f32 samples
        assert out >= trace_gb  # sanity: the trace is in the output
        assert temp < 0.75 * trace_gb + 0.2, (
            f"NUTS ensemble temp {temp:.2f} GB vs trace {trace_gb:.2f} GB — "
            "a temp at trace scale means the relayout copy is back"
        )


@pytest.mark.slow
class TestTraceDtype:
    """Opt-in reduced-precision trace storage: sampling precision is the
    state's; STORAGE precision is a policy knob (halves the dominant
    (C, N, D) allocation and host-offload IO)."""

    def _lp(self, t):
        return -0.5 * jnp.sum((t / jnp.array([0.5, 1.0, 2.0])) ** 2)

    def test_chees_bf16_trace_matches_f32_cast(self):
        import dataclasses

        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        key = jax.random.key(0)
        cfg = ChEESConfig(num_samples=60, step_size=0.2, burn=20,
                          init_trajectory_length=0.3)
        r32 = run_chees(key, self._lp, jnp.zeros(3), cfg, num_chains=8)
        r16 = run_chees(key, self._lp, jnp.zeros(3),
                        dataclasses.replace(cfg, trace_dtype="bfloat16"),
                        num_chains=8)
        assert r16.samples.dtype == jnp.bfloat16
        # identical chain states, cast exactly once at storage
        np.testing.assert_array_equal(
            np.asarray(r16.samples, np.float32),
            np.asarray(r32.samples.astype(jnp.bfloat16), np.float32),
        )
        # the chain itself still computed in f32: the carry is full precision
        assert r16.final_carry.thetas.dtype == jnp.float32

    @pytest.mark.parametrize("thin", [1, 3])
    def test_nuts_paths_bf16(self, thin):
        import dataclasses

        from hamiltorch_tpu.samplers.nuts import (
            NUTSConfig,
            run_nuts,
            run_nuts_ensemble,
        )

        key = jax.random.key(1)
        cfg = NUTSConfig(num_samples=30, step_size=0.3, burn=12,
                         trace_dtype="bfloat16", thin=thin)
        r, _ = run_nuts(key, self._lp, jnp.zeros(3), cfg)
        assert r.samples.dtype == jnp.bfloat16
        assert r.samples.shape == (30 // thin, 3)
        r32, _ = run_nuts(key, self._lp, jnp.zeros(3),
                          dataclasses.replace(cfg, trace_dtype=None))
        np.testing.assert_array_equal(
            np.asarray(r.samples, np.float32),
            np.asarray(r32.samples.astype(jnp.bfloat16), np.float32),
        )
        re_, _ = run_nuts_ensemble(key, self._lp, jnp.zeros(3), cfg,
                                   num_chains=4)
        assert re_.samples.dtype == jnp.bfloat16
        assert re_.samples.shape == (4, 30 // thin, 3)
        assert re_.final_state.theta.dtype == jnp.float32

    def test_bf16_halves_the_compiled_trace(self):
        from hamiltorch_tpu.ops.mass import make_mass
        from hamiltorch_tpu.ops.potential import resolve_potential
        from hamiltorch_tpu.samplers.chees import ChEESConfig, _run_chees_jit

        lp, data = resolve_potential(self._lp, None)
        mass = make_mass(None, 3)

        def out_bytes(cfg):
            compiled = _run_chees_jit.lower(
                jax.random.key(0), jnp.zeros((256, 3)), lp, cfg, mass,
                data=data,
            ).compile()
            return compiled.memory_analysis().output_size_in_bytes

        base = ChEESConfig(num_samples=400, step_size=0.2, burn=100)
        import dataclasses

        b32 = out_bytes(base)
        b16 = out_bytes(dataclasses.replace(base, trace_dtype="bfloat16"))
        trace32 = 256 * 400 * 3 * 4
        assert b32 - b16 == trace32 // 2  # exactly the trace halved

    def test_invalid_trace_dtype_rejected(self):
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        with pytest.raises(ValueError, match="dtype"):
            NUTSConfig(num_samples=10, trace_dtype="int32")
        with pytest.raises(ValueError, match="hashable|NAME"):
            NUTSConfig(num_samples=10, trace_dtype=jnp.bfloat16)
        with pytest.raises(ValueError, match="dtype"):
            NUTSConfig(num_samples=10, trace_dtype="not_a_dtype")

    def test_checkpointed_bf16_trace_roundtrip(self, tmp_path):
        """bf16 traces survive the chunk files: np.savez would store
        ml_dtypes floats as raw void bytes, so chunks save the trace
        upcast to f32 and assembly casts back — resumed == direct,
        bit-exact (bf16 -> f32 -> bf16 is the identity)."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_chees_checkpointed
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        key = jax.random.key(3)
        cfg = ChEESConfig(num_samples=60, step_size=0.2, burn=20,
                          init_trajectory_length=0.3,
                          trace_dtype="bfloat16")
        r_direct = run_chees(key, self._lp, jnp.zeros(3), cfg, num_chains=8)
        run_chees_checkpointed(
            key, self._lp, jnp.zeros(3),
            dataclasses.replace(cfg, num_samples=30), str(tmp_path / "c"),
            num_chains=8, chunk_size=30,
        )
        r_ck = run_chees_checkpointed(
            key, self._lp, jnp.zeros(3), cfg, str(tmp_path / "c"),
            num_chains=8, chunk_size=30,
        )
        assert r_ck.samples.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(r_ck.samples, np.float32),
            np.asarray(r_direct.samples, np.float32),
        )

    def test_bf16_trace_predicts_and_reports_f32_acc(self, tmp_path):
        """Review findings: a bf16 trace must flow through predict_model's
        loader path (the scan accumulator promotes to f32) and a
        checkpointed run's acc_rate must stay at the CHAIN dtype, agreeing
        with the direct run."""
        import dataclasses

        import flax.linen as nn

        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed
        from hamiltorch_tpu.models.bnn import (
            define_model_tree_log_prob,
            predict_model,
        )
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(1)(x)

        x = jnp.linspace(-1, 1, 8)[:, None]
        y = 2.0 * x
        lp, template = define_model_tree_log_prob(
            Net(), "regression", x, y, tau_out=10.0)
        cfg = NUTSConfig(num_samples=20, step_size=0.05, burn=8,
                         trace_dtype="bfloat16")
        key = jax.random.key(5)
        r, _ = run_nuts(key, lp, template, cfg)
        assert jax.tree_util.tree_leaves(r.samples)[0].dtype == jnp.bfloat16
        loader = [(np.asarray(x[:5]), np.asarray(y[:5])),
                  (np.asarray(x[5:]), np.asarray(y[5:]))]
        preds, lps = predict_model(Net(), r.samples, test_loader=loader,
                                   model_loss="regression", tau_out=10.0)
        assert preds.shape[:2] == (20, 8)
        assert lps.dtype == jnp.float32  # accumulator promoted, not bf16
        r_ck = run_nuts_checkpointed(key, lp, template, cfg,
                                     str(tmp_path / "bf"), chunk_size=10)
        assert r_ck.acc_rate.dtype == jnp.float32
        np.testing.assert_allclose(float(r_ck.acc_rate),
                                   float(jnp.mean(r.stats.accept_prob)),
                                   atol=0.3)  # same statistic family, f32

    def test_nuts_offload_dense_without_burn_stays_diagonal(self):
        """adapt_mass='dense' with burn=0 must not thread dead (d, d)
        matrices through the offload chunks (review finding: ~120 GB at
        the flagship width)."""
        from hamiltorch_tpu.samplers.nuts import NUTSConfig
        from hamiltorch_tpu.samplers.offload import run_nuts_host_offload

        cfg = NUTSConfig(num_samples=12, step_size=0.3, burn=0,
                         adapt_step_size=False, adapt_mass="dense")
        r = run_nuts_host_offload(jax.random.key(0), self._lp, jnp.zeros(3),
                                  cfg, chunk_size=6)
        # metric seed stays the (d,) diagonal, not an (inv, chol) pair
        assert r.final_warm[1].ndim == 1
