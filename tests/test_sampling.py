"""Sampler correctness: inverse-CDF categorical and alias tables."""
import jax
import jax.numpy as jnp
import numpy as np

from pecanpy_tpu.ops import sampling


def alias_implied_probs(alias_j, alias_q, deg):
    """Exact distribution encoded by an alias table row.

    P(i) = (q[i] + sum_{a: j[a] = i, a != i, q[a] < 1} (1 - q[a])) / k
    """
    k = deg
    probs = np.zeros(k)
    for slot in range(k):
        probs[slot] += alias_q[slot] if alias_q[slot] < 1.0 else 1.0
        if alias_q[slot] < 1.0:
            probs[alias_j[slot]] += 1.0 - alias_q[slot]
    return probs / k


class TestCategorical:
    def test_matches_distribution(self):
        weights = jnp.asarray(
            [[0.5, 0.0, 2.0, 1.5, 0.0], [1.0, 1.0, 1.0, 0.0, 0.0]]
        )
        n = 40000
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        draw = jax.jit(jax.vmap(lambda k: sampling.categorical_rows(k, weights)))
        samples = np.asarray(draw(keys))  # [n, 2]
        for row in range(2):
            w = np.asarray(weights[row])
            expected = w / w.sum()
            freq = np.bincount(samples[:, row], minlength=5) / n
            np.testing.assert_allclose(freq, expected, atol=0.01)

    def test_zero_rows_return_zero(self):
        weights = jnp.zeros((4, 3))
        out = sampling.categorical_rows(jax.random.PRNGKey(1), weights)
        assert (np.asarray(out) == 0).all()

    def test_never_selects_padding(self):
        weights = jnp.asarray([[1.0, 2.0, 0.0, 0.0]])
        keys = jax.random.split(jax.random.PRNGKey(2), 2000)
        draws = np.asarray(
            jax.vmap(lambda k: sampling.categorical_rows(k, weights))(keys)
        )
        assert draws.max() <= 1


class TestAlias:
    def test_tables_encode_exact_distribution(self, rng):
        # padded rows of assorted lengths
        d = 8
        rows, degs = [], []
        for deg in [1, 2, 3, 5, 8]:
            w = np.zeros(d, dtype=np.float32)
            w[:deg] = rng.uniform(0.1, 3.0, deg)
            rows.append(w)
            degs.append(deg)
        weights = jnp.asarray(np.stack(rows))
        degrees = jnp.asarray(np.array(degs, dtype=np.int32))
        aj, aq = jax.jit(sampling.alias_build)(weights, degrees)
        aj, aq = np.asarray(aj), np.asarray(aq)
        for i, deg in enumerate(degs):
            w = np.asarray(weights[i][:deg])
            expected = w / w.sum()
            implied = alias_implied_probs(aj[i], aq[i], deg)
            np.testing.assert_allclose(implied, expected, rtol=1e-4, atol=1e-6)

    def test_draw_distribution(self, rng):
        d = 6
        w = np.zeros((1, d), dtype=np.float32)
        w[0, :4] = [4.0, 2.0, 1.0, 1.0]
        weights = jnp.asarray(w)
        degrees = jnp.asarray(np.array([4], dtype=np.int32))
        aj, aq = sampling.alias_build(weights, degrees)

        n = 40000
        keys = jax.random.split(jax.random.PRNGKey(3), n)
        draw = jax.jit(
            jax.vmap(
                lambda k: sampling.alias_draw(
                    k, aj, aq, jnp.zeros(1, jnp.int32), degrees
                )
            )
        )
        samples = np.asarray(draw(keys)).ravel()
        freq = np.bincount(samples, minlength=4) / n
        np.testing.assert_allclose(freq, [0.5, 0.25, 0.125, 0.125], atol=0.01)

    def test_uniform_row(self):
        weights = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
        degrees = jnp.asarray(np.array([3], dtype=np.int32))
        aj, aq = sampling.alias_build(weights, degrees)
        implied = alias_implied_probs(np.asarray(aj)[0], np.asarray(aq)[0], 3)
        np.testing.assert_allclose(implied, np.ones(3) / 3, rtol=1e-5)
