"""SVGD tests: Gaussian moment recovery, mixture-mode coverage (the
capability mean-field ADVI lacks), pytree states via the ravel boundary,
bit-exact resume, data-operand plumbing, the data-sharded mesh runner,
non-finite rejection, and config validation.

No reference counterpart — the reference's only posterior machinery is
MCMC (reference: hamiltorch/samplers.py:850-1091); SVGD adds the
particle-VI regime on the same potential protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.svgd import SVGDConfig, SVGDResult, run_svgd

COV = jnp.array([[1.0, 0.8], [0.8, 2.0]])
PREC = jnp.linalg.inv(COV)


def gauss_lp(t):
    return -0.5 * t @ PREC @ t


class TestSVGDStatistics:
    @pytest.mark.slow
    def test_correlated_gaussian_moments(self, key):
        """200 particles reproduce N(0, COV)'s mean and covariance.

        SVGD's finite-n kernel repulsion under-disperses slightly, so the
        covariance tolerance is loose (15%) while the mean is tight."""
        cfg = SVGDConfig(num_steps=500, step_size=0.2)
        r = run_svgd(key, gauss_lp, jnp.zeros(2), cfg, num_particles=200)
        x = np.asarray(r.particles)
        assert np.allclose(x.mean(0), 0.0, atol=0.15)
        assert np.allclose(np.cov(x.T), np.asarray(COV), rtol=0.15,
                           atol=0.15)
        assert int(r.num_rejected) == 0
        # the ensemble converged: late update magnitudes are far below
        # early ones
        assert float(r.phi_norm_trace[-1]) < 0.2 * float(
            r.phi_norm_trace[:10].max()
        )

    @pytest.mark.slow
    def test_mixture_mode_coverage(self, key):
        """Both modes of a well-separated 1-D mixture keep particles —
        the repulsion term prevents the mean-field collapse."""

        def mix_lp(t):
            z = t[0]
            return jnp.logaddexp(-0.5 * (z - 3.0) ** 2,
                                 -0.5 * (z + 3.0) ** 2)

        cfg = SVGDConfig(num_steps=600, step_size=0.3, init_scale=1.0)
        r = run_svgd(key, mix_lp, jnp.zeros(1), cfg, num_particles=100)
        z = np.asarray(r.particles)[:, 0]
        frac_right = float(np.mean(z > 0))
        assert 0.2 < frac_right < 0.8
        # particles sit AT the modes, not between them
        assert np.abs(np.abs(z) - 3.0).mean() < 1.0

    def test_fixed_bandwidth_matches_kernel_scale(self, key):
        """bandwidth=l pins the trace to h = 2 l^2 every step."""
        cfg = SVGDConfig(num_steps=5, step_size=0.1, bandwidth=0.7)
        r = run_svgd(key, gauss_lp, jnp.zeros(2), cfg, num_particles=16)
        assert np.allclose(np.asarray(r.bandwidth_trace), 2 * 0.7**2)

    def test_median_heuristic_tracks_cloud(self, key):
        """The adaptive bandwidth is positive and step-varying."""
        cfg = SVGDConfig(num_steps=50, step_size=0.2)
        r = run_svgd(key, gauss_lp, jnp.zeros(2), cfg, num_particles=32)
        h = np.asarray(r.bandwidth_trace)
        assert (h > 0).all() and np.unique(h).size > 1


class TestSVGDMechanics:
    def test_resume_bit_exact(self, key):
        """Two 50-step chunks through (particles0, init_aux, start_step)
        equal one 100-step run bit-for-bit — the adagrad accumulator and
        the t==0 seeding branch both ride the carry."""
        full = run_svgd(key, gauss_lp, jnp.zeros(2),
                        SVGDConfig(num_steps=100, step_size=0.2),
                        num_particles=32)
        half = SVGDConfig(num_steps=50, step_size=0.2)
        r1 = run_svgd(key, gauss_lp, jnp.zeros(2), half, num_particles=32)
        r2 = run_svgd(key, gauss_lp, jnp.zeros(2), half, num_particles=32,
                      particles0=r1.particles, init_aux=r1.final_aux,
                      start_step=r1.final_step)
        assert bool(jnp.all(r2.particles == full.particles))
        assert bool(jnp.all(r2.final_aux == full.final_aux))
        assert int(r2.final_step) == int(full.final_step) == 100

    def test_pytree_state_matches_flat(self, key):
        """A dict-state run equals the flat run on the raveled potential
        bit-for-bit (boundary ravel only reorders the view)."""
        cfg = SVGDConfig(num_steps=40, step_size=0.2)
        tree0 = {"a": jnp.zeros(1), "b": jnp.zeros(1)}

        def tree_lp(p):
            t = jnp.concatenate([p["a"], p["b"]])
            return gauss_lp(t)

        rt = run_svgd(key, tree_lp, tree0, cfg, num_particles=32)
        rf = run_svgd(key, gauss_lp, jnp.zeros(2), cfg, num_particles=32)
        flat_t = jnp.concatenate(
            [rt.particles["a"], rt.particles["b"]], axis=1
        )
        assert bool(jnp.all(flat_t == rf.particles))
        assert rt.particles["a"].shape == (32, 1)

    def test_data_operand_plumbing(self, key):
        """log_prob(theta, data) with data as a jit operand equals the
        closure run; swapping data does not require retracing (identity-
        stable wrapper covered by the tree path)."""
        x = jnp.linspace(-1, 1, 16)
        y = 2.0 * x + 0.1

        def lp_data(t, d):
            xs, ys = d
            r = ys - t[0] * xs - t[1]
            return -0.5 * jnp.sum(r * r) - 0.5 * jnp.sum(t * t)

        cfg = SVGDConfig(num_steps=30, step_size=0.2)
        rd = run_svgd(key, lp_data, jnp.zeros(2), cfg, num_particles=16,
                      data=(x, y))
        lp_closed = lambda t: lp_data(t, (x, y))
        rc = run_svgd(key, lp_closed, jnp.zeros(2), cfg, num_particles=16)
        assert np.allclose(np.asarray(rd.particles),
                           np.asarray(rc.particles))

    def test_nonfinite_steps_rejected_branchlessly(self, key):
        """A potential with a NaN cliff never corrupts the cloud — bad
        steps are skipped and counted, the result stays finite."""

        def cliff_lp(t):
            # nan * t keeps the GRADIENT nan too (a bare nan constant
            # differentiates to a clean 0 and would never trip rejection)
            bad = jnp.nan * jnp.sum(t)
            return jnp.where(t[0] > 0.35, bad, -0.5 * jnp.sum(t * t))

        cfg = SVGDConfig(num_steps=50, step_size=0.5, init_scale=0.3)
        r = run_svgd(key, cliff_lp, jnp.zeros(2), cfg, num_particles=16)
        assert bool(jnp.all(jnp.isfinite(r.particles)))
        assert int(r.num_rejected) > 0

    def test_sgd_optimizer_path(self, key):
        cfg = SVGDConfig(num_steps=50, step_size=0.05, optimizer="sgd")
        r = run_svgd(key, gauss_lp, jnp.zeros(2), cfg, num_particles=16)
        assert isinstance(r, SVGDResult)
        assert bool(jnp.all(jnp.isfinite(r.particles)))

    def test_config_validation(self):
        with pytest.raises(ValueError, match="num_steps"):
            SVGDConfig(num_steps=0)
        with pytest.raises(ValueError, match="optimizer"):
            SVGDConfig(num_steps=1, optimizer="adamw")
        with pytest.raises(ValueError, match="bandwidth"):
            SVGDConfig(num_steps=1, bandwidth=-1.0)
        with pytest.raises(ValueError, match="step_size"):
            SVGDConfig(num_steps=1, step_size=0.0)

    def test_particle_count_validation(self, key):
        with pytest.raises(ValueError, match="num_particles"):
            run_svgd(key, gauss_lp, jnp.zeros(2),
                     SVGDConfig(num_steps=1), num_particles=1)
        with pytest.raises(ValueError, match="particles0"):
            run_svgd(key, gauss_lp, jnp.zeros(2),
                     SVGDConfig(num_steps=1), num_particles=8,
                     particles0=jnp.zeros((4, 2)))


class TestSVGDSharded:
    def test_sharded_matches_local_short(self, key):
        """The data-sharded runner equals the local data-operand run for
        a short horizon (long horizons compound f32 summation-order
        drift through the interacting ensemble — same caveat as every
        sharded family); the posterior means agree at convergence
        tolerance in the slow test below."""
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_svgd_sharded

        n, d = 64, 3
        w_true = jnp.array([1.0, -2.0, 0.5])
        kx, ky = jax.random.split(jax.random.key(11))
        x = jax.random.normal(kx, (n, d))
        y = x @ w_true + 0.1 * jax.random.normal(ky, (n,))

        def loglik_shard(t, xs, ys):
            r = ys - xs @ t
            return -0.5 * jnp.sum(r * r) / 0.01

        log_prior = lambda t: -0.5 * jnp.sum(t * t)
        cfg = SVGDConfig(num_steps=15, step_size=0.1)
        mesh = make_mesh(chains=1, data=8)
        rs = run_svgd_sharded(key, loglik_shard, log_prior, x, y,
                              jnp.zeros(d), cfg, mesh, num_particles=24)
        lp = lambda t, dd: log_prior(t) + loglik_shard(t, dd[0], dd[1])
        rl = run_svgd(key, lp, jnp.zeros(d), cfg, num_particles=24,
                      data=(x, y))
        assert np.allclose(np.asarray(rs.particles),
                           np.asarray(rl.particles), atol=2e-4)
        assert int(rs.num_rejected) == 0

    @pytest.mark.slow
    def test_sharded_posterior_recovery(self, key):
        """At convergence the sharded ensemble centers on the conjugate
        linear-regression posterior mean."""
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_svgd_sharded

        n, d = 64, 3
        w_true = jnp.array([1.0, -2.0, 0.5])
        kx, ky = jax.random.split(jax.random.key(11))
        x = jax.random.normal(kx, (n, d))
        y = x @ w_true + 0.1 * jax.random.normal(ky, (n,))
        s2 = 0.01

        def loglik_shard(t, xs, ys):
            r = ys - xs @ t
            return -0.5 * jnp.sum(r * r) / s2

        log_prior = lambda t: -0.5 * jnp.sum(t * t)
        cfg = SVGDConfig(num_steps=300, step_size=0.1)
        mesh = make_mesh(chains=1, data=8)
        r = run_svgd_sharded(key, loglik_shard, log_prior, x, y,
                             jnp.zeros(d), cfg, mesh, num_particles=50)
        post_prec = jnp.eye(d) + x.T @ x / s2
        post_mean = jnp.linalg.solve(post_prec, x.T @ y / s2)
        got = np.asarray(r.particles).mean(0)
        assert np.allclose(got, np.asarray(post_mean), atol=0.05)

    def test_sharded_rejects_indivisible_data(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_svgd_sharded

        mesh = make_mesh(chains=1, data=8)
        with pytest.raises(ValueError, match="not divisible"):
            run_svgd_sharded(
                key, lambda t, xs, ys: 0.0, lambda t: 0.0,
                jnp.zeros((9, 1)), jnp.zeros(9), jnp.zeros(2),
                SVGDConfig(num_steps=1), mesh,
            )
