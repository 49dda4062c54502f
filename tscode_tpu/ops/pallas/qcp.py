'''
Pallas TPU kernel: fused QCP two-gate RMSD kill bits for pruning blocks.

Layout: PAIRS are the tile. For a block of L structures, the 9
correlation components S_ik[p,q] = sum_n P[p,n,i] P[q,n,k] are nine
(L, N)@(N, L) matmuls (MXU), and everything downstream — Theobald's
quartic coefficients, the Newton iteration for lambda_max, Horn's 4x4
adjugate eigenvector, the rotation matrix, and the per-atom maxdev
gate — is elementwise math over (L, L) tiles at full lane utilization.
Nothing leaves VMEM but the (L,) kill bits.

Semantics identical to ops/rmsd_prune._gathered_kill_blocks: structure p
dies when some q in (p, m_real) has rmsd < thr AND maxdev < 2*thr
(uncentered Kabsch, reference rmsd_pruning.py:6-41 accept rule).

STATUS: EXPERIMENTAL, opt-in via TSCODE_USE_PALLAS_QCP=1. Semantics are
verified in interpreter mode (tests/test_pallas.py); on real TPU the
Mosaic compile of this body has not completed within an hour on the
tunneled deployment (a fori_loop-over-blocks variant failed outright
with 136MB of vreg spills). The XLA path in ops/rmsd_prune remains the
production pruner. Next slimming steps if revisited: fori_loop over the
atom axis of the maxdev gate, or split the rare maxdev confirm into a
second pass.
'''

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEWTON_ITERS = 12


_GROUP = 8     # blocks per grid step (sublane alignment of the output)


def _make_qcp_kernel(N, L):
    '''Kernel closure over static (atom count, block length). One block
    per grid step; the output block spec groups _GROUP consecutive steps
    onto one (8, L) VMEM tile (sublane alignment) which stays resident
    while its index map is unchanged. A fori_loop over blocks inside one
    step was tried first and spilled 136MB of vregs — one block per step
    keeps the live tile set small.'''

    def kernel(P_ref, params_ref, out_ref):
        # P_ref: (1, L, N, 3) VMEM; params_ref: full (B, 2) SMEM
        # [thr^2, m_real]; out_ref: (_GROUP, L) int32, row b % _GROUP
        b = pl.program_id(0)
        _one_block(P_ref, params_ref, out_ref, b, N, L)

    return kernel


def _one_block(P_ref, params_ref, out_ref, blk, N, L):
        thr2 = params_ref[blk, 0]
        m_real = params_ref[blk, 1]

        P = [P_ref[0, :, :, i] for i in range(3)]       # 3 x (L, N)

        # --- correlations: S[i][k] = P_i @ P_k^T  (9 MXU matmuls) ----
        S = [[jax.lax.dot_general(
            P[i], P[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            for k in range(3)] for i in range(3)]       # (L, L) tiles

        G = (jnp.sum(P[0] * P[0], axis=1, keepdims=True)
             + jnp.sum(P[1] * P[1], axis=1, keepdims=True)
             + jnp.sum(P[2] * P[2], axis=1, keepdims=True))  # (L, 1)
        GA = G                                           # rows: p
        GB = jnp.transpose(G)                            # cols: q

        Sxx, Sxy, Sxz = S[0][0], S[0][1], S[0][2]
        Syx, Syy, Syz = S[1][0], S[1][1], S[1][2]
        Szx, Szy, Szz = S[2][0], S[2][1], S[2][2]

        # --- Theobald quartic coefficients -------------------------
        Sxx2, Syy2, Szz2 = Sxx * Sxx, Syy * Syy, Szz * Szz
        Sxy2, Syz2, Sxz2 = Sxy * Sxy, Syz * Syz, Sxz * Sxz
        Syx2, Szy2, Szx2 = Syx * Syx, Szy * Szy, Szx * Szx

        SyzSzymSyySzz2 = 2.0 * (Syz * Szy - Syy * Szz)
        Sxx2Syy2Szz2Syz2Szy2 = Syy2 + Szz2 - Sxx2 + Syz2 + Szy2

        C2 = -2.0 * (Sxx2 + Syy2 + Szz2 + Sxy2 + Syx2 + Sxz2
                     + Szx2 + Syz2 + Szy2)
        C1 = 8.0 * (Sxx * Syz * Szy + Syy * Szx * Sxz + Szz * Sxy * Syx
                    - Sxx * Syy * Szz - Syz * Szx * Sxy - Szy * Syx * Sxz)

        SxzpSzx = Sxz + Szx
        SyzpSzy = Syz + Szy
        SxypSyx = Sxy + Syx
        SyzmSzy = Syz - Szy
        SxzmSzx = Sxz - Szx
        SxymSyx = Sxy - Syx
        SxxpSyy = Sxx + Syy
        SxxmSyy = Sxx - Syy
        Sxy2Sxz2Syx2Szx2 = Sxy2 + Sxz2 - Syx2 - Szx2

        C0 = (Sxy2Sxz2Syx2Szx2 * Sxy2Sxz2Syx2Szx2
              + (Sxx2Syy2Szz2Syz2Szy2 + SyzSzymSyySzz2)
              * (Sxx2Syy2Szz2Syz2Szy2 - SyzSzymSyySzz2)
              + (-SxzpSzx * SyzmSzy + SxymSyx * (SxxmSyy - Szz))
              * (-SxzmSzx * SyzpSzy + SxymSyx * (SxxmSyy + Szz))
              + (-SxzpSzx * SyzpSzy - SxypSyx * (SxxpSyy - Szz))
              * (-SxzmSzx * SyzmSzy - SxypSyx * (SxxpSyy + Szz))
              + (SxypSyx * SyzpSzy + SxzpSzx * (SxxmSyy + Szz))
              * (-SxymSyx * SyzmSzy + SxzpSzx * (SxxpSyy + Szz))
              + (SxypSyx * SyzmSzy + SxzmSzx * (SxxmSyy - Szz))
              * (-SxymSyx * SyzpSzy + SxzmSzx * (SxxpSyy - Szz)))

        # --- Newton for lambda_max ---------------------------------
        lam = 0.5 * (GA + GB)
        for _ in range(_NEWTON_ITERS):
            lam2 = lam * lam
            b = (lam2 + C2) * lam
            a = b + C1
            num = a * lam + C0
            den = 2.0 * lam2 * lam + b + a
            den = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
            lam = lam - num / den

        msd = (GA + GB - 2.0 * lam) * (1.0 / N)
        gate_rmsd = msd < thr2

        # --- Horn key matrix + adjugate eigenvector ----------------
        k00 = Sxx + Syy + Szz - lam
        k01 = Syz - Szy
        k02 = Szx - Sxz
        k03 = Sxy - Syx
        k11 = Sxx - Syy - Szz - lam
        k12 = Sxy + Syx
        k13 = Szx + Sxz
        k22 = -Sxx + Syy - Szz - lam
        k23 = Syz + Szy
        k33 = -Sxx - Syy + Szz - lam

        K = [[k00, k01, k02, k03],
             [k01, k11, k12, k13],
             [k02, k12, k22, k23],
             [k03, k13, k23, k33]]

        def det3(rows, cols):
            m = [[K[r][c] for c in cols] for r in rows]
            return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                    - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                    + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

        idx = (0, 1, 2, 3)
        best_q = None
        best_n2 = None
        for r in range(4):
            rows = tuple(i for i in idx if i != r)
            comps = []
            for c in range(4):
                cols = tuple(j for j in idx if j != c)
                sign = (-1.0) ** (r + c)
                comps.append(sign * det3(rows, cols))
            n2 = (comps[0] * comps[0] + comps[1] * comps[1]
                  + comps[2] * comps[2] + comps[3] * comps[3])
            if best_q is None:
                best_q, best_n2 = comps, n2
            else:
                take = n2 > best_n2
                best_q = [jnp.where(take, c_new, c_old)
                          for c_new, c_old in zip(comps, best_q)]
                best_n2 = jnp.where(take, n2, best_n2)

        inv_norm = jax.lax.rsqrt(jnp.maximum(best_n2, 1e-30))
        degenerate = best_n2 <= 1e-22
        qw = jnp.where(degenerate, 1.0, best_q[0] * inv_norm)
        qx = jnp.where(degenerate, 0.0, best_q[1] * inv_norm)
        qy = jnp.where(degenerate, 0.0, best_q[2] * inv_norm)
        qz = jnp.where(degenerate, 0.0, best_q[3] * inv_norm)

        # rotation matrix tiles (R p ~ q convention)
        R00 = 2 * (qw * qw + qx * qx) - 1
        R01 = 2 * (qx * qy - qw * qz)
        R02 = 2 * (qx * qz + qw * qy)
        R10 = 2 * (qx * qy + qw * qz)
        R11 = 2 * (qw * qw + qy * qy) - 1
        R12 = 2 * (qy * qz - qw * qx)
        R20 = 2 * (qx * qz - qw * qy)
        R21 = 2 * (qy * qz + qw * qx)
        R22 = 2 * (qw * qw + qz * qz) - 1
        R = [[R00, R01, R02], [R10, R11, R12], [R20, R21, R22]]

        # --- maxdev gate: per atom |R p_n - q_n|^2 ------------------
        # |R p_n|^2 = |p_n|^2; cross = q_n . (R p_n)
        four_thr2 = 4.0 * thr2
        maxdev2 = jnp.zeros_like(lam)
        for n in range(N):
            pn2 = (P[0][:, n:n + 1] * P[0][:, n:n + 1]
                   + P[1][:, n:n + 1] * P[1][:, n:n + 1]
                   + P[2][:, n:n + 1] * P[2][:, n:n + 1])   # (L, 1)
            qn2 = jnp.transpose(pn2)                        # (1, L)
            cross = jnp.zeros_like(lam)
            for i in range(3):
                qi = jnp.transpose(P[i][:, n:n + 1])        # (1, L) rows q
                for k in range(3):
                    pk = P[k][:, n:n + 1]                   # (L, 1) rows p
                    cross = cross + R[i][k] * (pk * qi)
            dev2 = pn2 + qn2 - 2.0 * cross
            maxdev2 = jnp.maximum(maxdev2, dev2)
        gate_dev = maxdev2 < four_thr2

        # --- kill reduction -----------------------------------------
        pos = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)     # p index
        qos = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)     # q index
        valid = (qos > pos) & (qos.astype(jnp.float32) < m_real)
        hit = jnp.where(gate_rmsd & gate_dev & valid, 1.0, 0.0)
        row = (jnp.sum(hit, axis=1, keepdims=True)
               .reshape(L) > 0.0).astype(jnp.int32)
        out_ref[blk % _GROUP, :] = row


@functools.partial(jax.jit, static_argnames=('interpret',))
def qcp_kill_blocks_pallas(P_blocks, m_real, rmsd_thr, interpret=False):
    '''
    P_blocks (B, L, N, 3) f32 gathered pruning blocks; m_real (B,) live
    rows per block; -> (B, L) bool kill bits. One grid step per block.
    '''
    B_in, L_in, N = P_blocks.shape[0], P_blocks.shape[1], P_blocks.shape[2]
    # lane alignment: the (L, L) pair tiles and the (B, L) output want
    # L to be a multiple of 128; pad with garbage rows masked by m_real.
    # B pads to the per-step group (dead blocks: m_real = 0).
    L = max(128, -(-L_in // 128) * 128)
    B = -(-B_in // _GROUP) * _GROUP
    P_blocks = jnp.pad(P_blocks, ((0, B - B_in), (0, L - L_in),
                                  (0, 0), (0, 0)))

    thr2 = (jnp.asarray(rmsd_thr, jnp.float32) ** 2)
    m_pad = jnp.pad(m_real.astype(jnp.float32), (0, B - B_in))
    params = jnp.concatenate([
        jnp.full((B, 1), thr2, dtype=jnp.float32),
        m_pad[:, None]], axis=1)                          # (B, 2)

    kernel = _make_qcp_kernel(N, L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, N, 3), lambda b: (b, 0, 0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret
                         else pltpu.SMEM),
        ],
        # _GROUP consecutive grid steps share one (8, L) output tile:
        # the tile stays in VMEM until the index map changes, each step
        # filling row b % _GROUP
        out_specs=pl.BlockSpec((_GROUP, L), lambda b: (b // _GROUP, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(P_blocks.astype(jnp.float32), params)
    return out[:B_in, :L_in].astype(bool)
