"""Latent-extraction surface tests (scrubvae_tpu/evals/latents.py).

The epoch_metric harness (reference eval/metrics.py:23-88) calls
encode_dataset once per saved epoch; the jitted closure must be reused
across calls (same model + dataset + batch size) or every call pays two
encoder compiles — ~13 s/call at the flagship point over the TPU tunnel
(measured by tools/eval_mu_bench.py before the cache existed)."""

import jax.numpy as jnp
import numpy as np

from scrubvae_tpu.evals.latents import encode_dataset


class StubModel:
    """Minimal apply/encode surface; mu = x @ w so results track params."""

    def apply(self, variables, data, train, method, mu_only):
        assert mu_only
        return {"mu": data["x"] @ variables["params"]["w"]}

    def encode(self):  # identity only; passed through as `method`
        raise NotImplementedError


class StubDataset:
    def __init__(self, n=10, d=4):
        self.x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)),
                             jnp.float32)

    def __len__(self):
        return self.x.shape[0]

    def batch(self, idx):
        return {"x": jnp.take(self.x, idx, axis=0)}


class TestEncodeDatasetCache:
    def test_jitted_closure_reused_across_calls(self):
        model, ds = StubModel(), StubDataset()
        w = {"params": {"w": jnp.eye(4)}}
        z1 = encode_dataset(model, w, ds, batch_size=4)
        enc_first = ds._enc_cache[2]
        z2 = encode_dataset(model, w, ds, batch_size=4)
        assert ds._enc_cache[2] is enc_first  # no re-jit
        np.testing.assert_allclose(z1, z2)
        np.testing.assert_allclose(z1, np.asarray(ds.x), rtol=1e-6)

    def test_new_params_reuse_compiled_fn(self):
        model, ds = StubModel(), StubDataset()
        z1 = encode_dataset(model, {"params": {"w": jnp.eye(4)}}, ds,
                            batch_size=4)
        enc_first = ds._enc_cache[2]
        z2 = encode_dataset(model, {"params": {"w": 2 * jnp.eye(4)}}, ds,
                            batch_size=4)
        assert ds._enc_cache[2] is enc_first  # params are an argument
        np.testing.assert_allclose(z2, 2 * z1, rtol=1e-6)

    def test_cache_invalidates_on_model_or_batch_change(self):
        model, ds = StubModel(), StubDataset()
        w = {"params": {"w": jnp.eye(4)}}
        encode_dataset(model, w, ds, batch_size=4)
        enc_first = ds._enc_cache[2]
        encode_dataset(model, w, ds, batch_size=5)
        assert ds._enc_cache[2] is not enc_first
        encode_dataset(StubModel(), w, ds, batch_size=5)
        assert ds._enc_cache[0] is not model

    def test_structurally_equal_model_reuses_cache(self):
        # the per-epoch extraction loop (latents() with model=None)
        # rebuilds an identical flax module object each call; the cache
        # keys on dataclass equality, not identity
        import dataclasses

        @dataclasses.dataclass(frozen=True)
        class EqModel:
            scale: float = 1.0

            def apply(self, variables, data, train, method, mu_only):
                return {"mu": data["x"] @ variables["params"]["w"] * self.scale}

            def encode(self):
                raise NotImplementedError

        ds = StubDataset()
        w = {"params": {"w": jnp.eye(4)}}
        encode_dataset(EqModel(), w, ds, batch_size=4)
        enc_first = ds._enc_cache[2]
        encode_dataset(EqModel(), w, ds, batch_size=4)  # equal, not identical
        assert ds._enc_cache[2] is enc_first
        encode_dataset(EqModel(scale=2.0), w, ds, batch_size=4)
        assert ds._enc_cache[2] is not enc_first

    def test_ragged_tail_batch(self):
        model, ds = StubModel(), StubDataset(n=10)
        w = {"params": {"w": jnp.eye(4)}}
        z = encode_dataset(model, w, ds, batch_size=4)  # 4+4+2
        assert z.shape == (10, 4)
        np.testing.assert_allclose(z, np.asarray(ds.x), rtol=1e-6)
