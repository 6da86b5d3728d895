"""Train a tensor-network classifier (DenseMPO backbone) on an MNIST-like
task — the BASELINE ``tn_keras`` configuration, with synthetic data since
this environment has no dataset egress.

Reference analog: the ``tn_keras`` train-step smoke tests
(``tn_keras/test_*.py``).  The model is Flax; parameters checkpoint
through the generic pytree saver.
"""
import os
import sys

if not os.environ.get("TN_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from tensornetwork_tpu.nn import DenseMPO, DenseDecomp


class TNClassifier(nn.Module):
    """784 -> MPO(256) -> decomp(64) -> 10 logits."""

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1))
        # pad 784 -> 1296 = 6^4 so the MPO legs factorize
        x = jnp.pad(x, ((0, 0), (0, 1296 - x.shape[1])))
        x = DenseMPO(output_dim=256, num_nodes=4, bond_dim=8,
                     activation=nn.relu)(x)
        x = DenseDecomp(output_dim=64, decomp_size=16,
                        activation=nn.relu)(x)
        return nn.Dense(10)(x)


def synthetic_mnist(n, seed=0):
    """28x28 images labeled by decile of a fixed random projection —
    learnable, nontrivial, dataset-free."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 28, 28)).astype(np.float32)
    w = np.random.default_rng(123).standard_normal(784) / 28.0
    proj = x.reshape(n, -1) @ w
    # decile edges from the standard normal of the projection
    import scipy.stats as st
    edges = st.norm.ppf(np.linspace(0.1, 0.9, 9), scale=np.linalg.norm(w))
    y = np.digitize(proj, edges)
    return jnp.asarray(x), jnp.asarray(y)


def main(steps=300, batch=128):
    x_train, y_train = synthetic_mnist(4096)
    x_test, y_test = synthetic_mnist(1024, seed=1)
    model = TNClassifier()
    params = model.init(jax.random.PRNGKey(0), x_train[:2])
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for k in range(steps):
        idx = rng.integers(0, x_train.shape[0], batch)
        params, opt_state, loss = step(params, opt_state, x_train[idx],
                                       y_train[idx])
        if k % 50 == 0:
            print(f"step {k}: loss {float(loss):.4f}")
    logits = model.apply(params, x_test)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == y_test))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"test accuracy: {acc:.3f} ({n_params} params; a dense "
          f"1296x256 layer alone would use {1296 * 256})")
    return acc, params


if __name__ == "__main__":
    main()
