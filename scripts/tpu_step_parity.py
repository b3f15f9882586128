"""On-chip differential check of the batched env step against host numpy.

Guards the chained-scatter miscompilation found on the tunneled-TPU
backend (see engine.env.apply_move): a vmapped
``board.at[t].set(board[f]).at[f].set(0)`` produced moves that zeroed the
destination and left the source piece in place on 592/1024 heterogeneous
boards — deterministically, silently, only on the compiled TPU program.

Plays random-legal-move games at batch 1024 and, every ply, replays the
move on the host with numpy and compares boards, quiet counters, history
ring and repetition/terminal flags. Bounded; asserts.

    python scripts/tpu_step_parity.py
"""

import sys

import numpy as np


def main(batch: int = 1024, plies: int = 30) -> int:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import jax
    import jax.numpy as jnp

    from xiangqi_alphazero_tpu.engine import env as E

    states = jax.jit(E.reset_batch, static_argnums=0)(batch)
    step_j = jax.jit(E.v_step)
    t = E._T()
    FR, TO = np.asarray(t["FR"]), np.asarray(t["TO"])

    rng = jax.random.key(9)
    mism = 0
    checked = 0
    for ply in range(plies):
        host = jax.tree.map(np.asarray, states)
        rng, k = jax.random.split(rng)
        g = jax.random.gumbel(k, states.legal.shape)
        act = jnp.argmax(
            jnp.where(states.legal, g, -jnp.inf), -1
        ).astype(jnp.int32)
        states = step_j(states, act)
        nxt = jax.tree.map(np.asarray, states)
        a = np.asarray(act)

        f, to = FR[a], TO[a]
        rows = np.arange(batch)
        want_board = host.board.copy()
        piece = want_board[rows, f].copy()
        captured = want_board[rows, to].copy()
        want_board[rows, to] = piece
        want_board[rows, f] = 0
        want_board[f == to, :] = host.board[f == to, :]
        want_board[rows[f == to], f[f == to]] = 0
        live = ~host.done
        mism += int((nxt.board[live] != want_board[live]).sum())
        want_quiet = np.where(captured != 0, 0, host.quiet + 1)
        mism += int((nxt.quiet[live] != want_quiet[live]).sum())
        # frozen games must not change
        frozen = host.done
        mism += int((nxt.board[frozen] != host.board[frozen]).sum())
        # history ring slot
        slot = host.ply % E.HIST_LEN
        want_h = host.hist.copy()
        want_h[rows, slot] = host.board
        mism += int((nxt.hist[live] != want_h[live]).sum())
        checked += int(live.sum())

    print(
        f"STEP PARITY {'OK' if mism == 0 else 'FAIL'}: "
        f"{checked} live board-steps checked, {mism} element mismatches"
    )
    assert mism == 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
