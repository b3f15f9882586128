"""Direct compiled-Pallas-kernel parity check on real TPU hardware.

Compares ``ops.legal_mask.legal_mask_pallas`` (the compiled kernel) against
the pure-XLA formulation ``engine.env.legal_mask`` on thousands of randomly
reached positions ON THE CHIP — the interpreter-mode test
(tests/test_pallas_mask.py) proves the same equality on CPU, but Mosaic
compilation and bf16 MXU behavior are only exercised here.

Bounded (< 60 s device wall-clock per program) and asserting:
    python scripts/tpu_mask_parity.py        # exits 0 + "PARITY OK ..."
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(batch: int = 1024, plies: int = 40) -> int:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.ops import legal_mask as LM

    if jax.default_backend() != "tpu":
        print("SKIP: needs the real TPU backend")
        return 0

    states = jax.jit(E.reset_batch, static_argnums=0)(batch)
    step_j = jax.jit(E.v_step)

    # diff count is computed ON DEVICE — only a scalar crosses the tunnel
    @jax.jit
    def diff_count(board, side):
        kernel = LM.legal_mask_pallas(board, side)
        xla = jax.vmap(E.legal_mask)(board, side)
        return jnp.sum((kernel != xla).astype(jnp.int32))

    rng = jax.random.key(123)
    total_boards = 0
    total_diffs = 0
    for ply in range(plies):
        total_diffs += int(np.asarray(diff_count(states.board, states.side)))
        total_boards += batch
        rng, k = jax.random.split(rng)
        g = jax.random.gumbel(k, states.legal.shape)
        act = jnp.argmax(
            jnp.where(states.legal, g, -jnp.inf), -1
        ).astype(jnp.int32)
        states = step_j(states, act)

    print(
        f"PARITY {'OK' if total_diffs == 0 else 'FAIL'}: "
        f"{total_boards} boards x 8100 actions, {total_diffs} mismatches"
    )
    assert total_diffs == 0, f"{total_diffs} kernel-vs-XLA mask mismatches"
    return 0


if __name__ == "__main__":
    sys.exit(main())
