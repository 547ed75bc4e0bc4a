"""GroupedMix (host-driven same-kind batching for mix plans) must be
BIT-IDENTICAL to the scanned-switch pipeline — same entry draws, same
apply keys, same branch math; only the dispatch structure differs."""

import numpy as np

import jax
import jax.numpy as jnp


def _imgs(rng, b, h, w):
    return jnp.asarray(rng.randint(0, 256, (b, h, w, 3))
                       .astype(np.float32))


def test_grouped_matches_scanned_run():
    from tpudenoise.noise.pipeline import GroupedMix, make_pipeline
    pipe = make_pipeline('noise_mix_var_medium', mode='TEST',
                         use_pallas=False)
    gm = GroupedMix('noise_mix_var_medium', mode='TEST', use_pallas=False)
    rng = np.random.RandomState(0)
    images = _imgs(rng, 7, 32, 40)
    key = jax.random.PRNGKey(5)
    want = np.asarray(pipe(key, images))
    got = np.asarray(gm.run_grouped(key, images))
    np.testing.assert_array_equal(got, want)
    # a different key redraws the groups; still exact
    key2 = jax.random.PRNGKey(11)
    np.testing.assert_array_equal(
        np.asarray(gm.run_grouped(key2, images)),
        np.asarray(pipe(key2, images)))


def test_grouped_matches_scanned_keyed_with_post():
    """The eval-harness path: per-image fold_in keys + a standalone
    bilateral post-pass (BASELINE config 3 shape, TRAIN-mode mix)."""
    from tpudenoise.noise.pipeline import GroupedMix, make_pipeline
    pipe = make_pipeline('noise_mix_var_low_bilateral', mode='TRAIN',
                         use_pallas=False)
    gm = GroupedMix('noise_mix_var_low_bilateral', mode='TRAIN',
                    use_pallas=False)
    rng = np.random.RandomState(1)
    images = _imgs(rng, 6, 32, 40)
    key = jax.random.PRNGKey(3)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(10, 16, dtype=jnp.int32))
    want = np.asarray(pipe.keyed(keys, images))
    got = np.asarray(gm.run_grouped(None, images, keys=keys))
    np.testing.assert_array_equal(got, want)


def test_grouped_matches_scanned_masked():
    """Bucketed-canvas path: padded images + per-image valid extents."""
    from tpudenoise.noise.pipeline import GroupedMix, make_pipeline
    pipe = make_pipeline('noise_mix_var_medium', mode='TEST',
                         use_pallas=False)
    gm = GroupedMix('noise_mix_var_medium', mode='TEST', use_pallas=False)
    rng = np.random.RandomState(2)
    b = 5
    images = _imgs(rng, b, 40, 48)
    hw = jnp.asarray([[32, 40], [40, 48], [36, 44], [30, 33], [40, 40]],
                     jnp.int32)
    key = jax.random.PRNGKey(9)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(b, dtype=jnp.int32))
    want = np.asarray(pipe.masked(keys, images, hw))
    got = np.asarray(gm.run_grouped(None, images, keys=keys, hw=hw))
    # compare within each image's valid extent (outside it the pad is
    # generator-defined either way, and identical here too)
    np.testing.assert_array_equal(got, want)


def test_grouped_draw_covers_entries():
    """The entry draw marginals: every template reachable, levels ride
    the entry tables."""
    from tpudenoise.noise.pipeline import GroupedMix
    gm = GroupedMix('noise_mix_var_all', mode='TEST', use_pallas=False)
    branch, level, akeys = gm.draw(jax.random.PRNGKey(0), 512)
    b = np.asarray(branch)
    assert b.min() >= 0 and b.max() < gm.n_templates
    # with 512 draws over ~38 entries, most templates appear
    assert len(np.unique(b)) >= gm.n_templates - 1
    assert np.asarray(level).shape == (512,)
