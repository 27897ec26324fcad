"""Slow NumPy reference implementations of the per-pixel formulas
(SURVEY.md section 2.1/2.3), used as test oracles for the vectorized JAX ops.

These are written directly from the mathematical specification, pixel by
pixel, so that agreement with the fused TPU code is meaningful.
"""

import math

import numpy as np

MAX_DEPTH_DIF = 0.1


def conv_mask():
    v = np.array([1.0, 2.0, 2.0, 1.0])
    return np.outer(v, v) / 36.0


def downsample_level_np(depth_prev, intensity_prev):
    R, C = depth_prev.shape[0] // 2, depth_prev.shape[1] // 2
    depth = np.zeros((R, C), np.float32)
    intensity = np.zeros((R, C), np.float32)
    mask = conv_mask()
    dp = np.pad(depth_prev, ((1, 2), (1, 2)))
    ip = np.pad(intensity_prev, ((1, 2), (1, 2)))
    for v in range(R):
        for u in range(C):
            inner = 0 < v < R - 1 and 0 < u < C - 1
            d_blk = dp[2 * v:2 * v + 4, 2 * u:2 * u + 4]
            i_blk = ip[2 * v:2 * v + 4, 2 * u:2 * u + 4]
            central = np.array([d_blk[1, 1], d_blk[2, 1], d_blk[1, 2], d_blk[2, 2]])
            if inner:
                dcenter = np.sort(central)[2]  # second maximum
                if dcenter != 0.0:
                    w_sum = s_d = s_c = 0.0
                    for a in range(4):
                        for b in range(4):
                            dif = abs(d_blk[a, b] - dcenter)
                            if dif < MAX_DEPTH_DIF:
                                w = mask[a, b] * (MAX_DEPTH_DIF - dif)
                                w_sum += w
                                s_d += w * d_blk[a, b]
                                s_c += w * i_blk[a, b]
                    depth[v, u] = s_d / w_sum
                    intensity[v, u] = s_c / w_sum
                else:
                    depth[v, u] = 0.0
                    intensity[v, u] = float(np.sum(mask * i_blk))
            else:
                c_i = np.array([i_blk[1, 1], i_blk[2, 1], i_blk[1, 2], i_blk[2, 2]])
                intensity[v, u] = 0.25 * np.sum(c_i)
                nz = central[central != 0.0]
                depth[v, u] = nz.mean() if len(nz) else 0.0
    return depth, intensity


def warp_splat_np(depth, intensity, xx, yy, T, fovh, extra_valid=None):
    rows, cols = depth.shape
    f = cols / (2.0 * math.tan(0.5 * fovh))
    disp_u, disp_v = 0.5 * (cols - 1), 0.5 * (rows - 1)
    acc_d = np.zeros((rows, cols), np.float64)
    acc_i = np.zeros((rows, cols), np.float64)
    wacu = np.zeros((rows, cols), np.float64)
    for i in range(rows):
        for j in range(cols):
            z = depth[i, j]
            if z == 0.0:
                continue
            if extra_valid is not None and not extra_valid[i, j]:
                continue
            x_w = T[0, 0] * xx[i, j] + T[0, 1] * yy[i, j] + T[0, 2] * z + T[0, 3]
            y_w = T[1, 0] * xx[i, j] + T[1, 1] * yy[i, j] + T[1, 2] * z + T[1, 3]
            z_w = T[2, 0] * xx[i, j] + T[2, 1] * yy[i, j] + T[2, 2] * z + T[2, 3]
            uwarp = int(100.0 * (f * x_w / z_w + disp_u))
            vwarp = int(100.0 * (f * y_w / z_w + disp_v))
            if not (0 <= uwarp < 100 * (cols - 1) and 0 <= vwarp < 100 * (rows - 1)):
                continue
            u_l = uwarp - uwarp % 100
            v_d = vwarp - vwarp % 100
            delta_r = u_l + 100 - uwarp
            delta_l = 100 - delta_r
            delta_u = v_d + 100 - vwarp
            delta_d = 100 - delta_u
            iw = intensity[i, j]
            if min(delta_r, delta_l) + min(delta_u, delta_d) < 5:
                iu = u_l // 100 if delta_r > delta_l else u_l // 100 + 1
                iv = v_d // 100 if delta_u > delta_d else v_d // 100 + 1
                acc_d[iv, iu] += 200.0 * z_w
                acc_i[iv, iu] += 200.0 * iw
                wacu[iv, iu] += 200
            else:
                vd, ul = v_d // 100, u_l // 100
                for (tv, tu, w) in [(vd + 1, ul + 1, delta_l + delta_d),
                                    (vd + 1, ul, delta_r + delta_d),
                                    (vd, ul + 1, delta_l + delta_u),
                                    (vd, ul, delta_r + delta_u)]:
                    acc_d[tv, tu] += w * z_w
                    acc_i[tv, tu] += w * iw
                    wacu[tv, tu] += w
    nz = wacu != 0
    depth_w = np.where(nz, acc_d / np.maximum(wacu, 1), 0.0)
    intensity_w = np.where(nz, acc_i / np.maximum(wacu, 1), 0.0)
    return depth_w.astype(np.float32), intensity_w.astype(np.float32), wacu


def bilateral_np(depth_mm, max_depth_m):
    rows, cols = depth_mm.shape
    out = np.zeros_like(depth_mm, dtype=np.float32)
    R = 6
    for y in range(rows):
        for x in range(cols):
            value = depth_mm[y, x]
            if value > max_depth_m * 1000.0 or value < 300:
                out[y, x] = 0
                continue
            s1 = s2 = 0.0
            for cy in range(max(y - R, 0), min(y + R + 1, rows)):
                for cx in range(max(x - R, 0), min(x + R + 1, cols)):
                    tmp = depth_mm[cy, cx]
                    space2 = float((x - cx) ** 2 + (y - cy) ** 2)
                    color2 = float(value - tmp) ** 2
                    w = math.exp(-(space2 * 0.024691358 + color2 * 0.000555556))
                    s1 += tmp * w
                    s2 += w
            out[y, x] = round(s1 / s2)
    return out


def derivatives_np(d, c, null):
    """Depth-adaptive weighted central differences on inter images."""
    rows, cols = d.shape
    rx = np.ones_like(d)
    ry = np.ones_like(d)
    rxc = np.ones_like(d)
    ryc = np.ones_like(d)
    for v in range(rows):
        for u in range(cols - 1):
            if not null[v, u]:
                rx[v, u] = abs(d[v, u + 1] - d[v, u]) + 0.005
                rxc[v, u] = abs(c[v, u + 1] - c[v, u]) + 1e-6
    for v in range(rows - 1):
        for u in range(cols):
            if not null[v, u]:
                ry[v, u] = abs(d[v + 1, u] - d[v, u]) + 0.005
                ryc[v, u] = abs(c[v + 1, u] - c[v, u]) + 1e-6
    dcu = np.zeros_like(d)
    dcv = np.zeros_like(d)
    ddu = np.zeros_like(d)
    ddv = np.zeros_like(d)
    for v in range(1, rows - 1):
        for u in range(1, cols - 1):
            if not null[v, u]:
                dcu[v, u] = (rxc[v, u - 1] * (c[v, u + 1] - c[v, u])
                             + rxc[v, u] * (c[v, u] - c[v, u - 1])) / (rxc[v, u] + rxc[v, u - 1])
                ddu[v, u] = (rx[v, u - 1] * (d[v, u + 1] - d[v, u])
                             + rx[v, u] * (d[v, u] - d[v, u - 1])) / (rx[v, u] + rx[v, u - 1])
                dcv[v, u] = (ryc[v - 1, u] * (c[v + 1, u] - c[v, u])
                             + ryc[v, u] * (c[v, u] - c[v - 1, u])) / (ryc[v, u] + ryc[v - 1, u])
                ddv[v, u] = (ry[v - 1, u] * (d[v + 1, u] - d[v, u])
                             + ry[v, u] * (d[v, u] - d[v - 1, u])) / (ry[v, u] + ry[v - 1, u])
    return dcu, dcv, ddu, ddv
