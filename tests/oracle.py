"""Independent numpy path-tracer oracle.

A from-scratch, per-ray sequential implementation of the minimal-cornell
megakernel (diffuse-only, constant-w absolute-precision march, EXP roulette)
used to validate the vectorized JAX engine end-to-end (SURVEY.md §4: the
test pyramid the reference lacks). Shares NOTHING with the engine except the
counter-RNG *definition* (pcg4d is reimplemented here in numpy).
"""
import numpy as np

U32 = np.uint32


def pcg4d_np(x, y, z, w):
    with np.errstate(over="ignore"):
        v = [U32(x), U32(y), U32(z), U32(w)]
        for i in range(4):
            v[i] = U32(v[i] * U32(1664525) + U32(1013904223))
        v[0] = U32(v[0] + v[1] * v[3])
        v[1] = U32(v[1] + v[2] * v[0])
        v[2] = U32(v[2] + v[0] * v[1])
        v[3] = U32(v[3] + v[1] * v[2])
        for i in range(4):
            v[i] = U32(v[i] ^ (v[i] >> U32(16)))
        v[0] = U32(v[0] + v[1] * v[3])
        v[1] = U32(v[1] + v[2] * v[0])
        v[2] = U32(v[2] + v[0] * v[1])
        v[3] = U32(v[3] + v[1] * v[2])
    return v


def uniform4_np(pixel, step, stream, seed=0):
    v = pcg4d_np(pixel, step, stream, seed)
    return [float(np.float32((int(x) >> 8) * np.float32(1.0 / (1 << 24))))
            for x in v]


def rot_zyx(deg):
    a = np.deg2rad(np.asarray(deg, np.float32))
    s, c = np.sin(a), np.cos(a)
    rz = np.array([[c[2], s[2], 0], [-s[2], c[2], 0], [0, 0, 1]], np.float32)
    ry = np.array([[c[1], 0, -s[1]], [0, 1, 0], [s[1], 0, c[1]]], np.float32)
    rx = np.array([[1, 0, 0], [0, c[0], s[0]], [0, -s[0], c[0]]], np.float32)
    return rz @ ry @ rx


def sd_box_np(p, b):
    q = np.abs(p) - b
    return (np.linalg.norm(np.maximum(q, 0.0))
            + min(float(q.max()), 0.0))


def box_normal_np(p, b):
    """Analytic gradient of the sharp-box SDF (matches autodiff of
    norm(max(q,0)) + min(max(q),0) with sign() subgradients)."""
    q = np.abs(p) - b
    s = np.sign(p)
    if (q > 0).any():
        m = np.maximum(q, 0.0)
        g = m / np.linalg.norm(m)
        return g * s
    g = np.zeros(3, np.float32)
    g[int(np.argmax(q))] = 1.0
    return g * s


class OracleCornell:
    """Matches models/cornell.minimal_* + render_image(diffuse_only=True,
    tonemapped=False)."""

    def __init__(self, width, height):
        self.w, self.h = width, height
        # scene: sorted order is stable (all BOX): same as spec order
        self.objects = []  # (pos, rotmat, scale, albedo, emission)
        def add(pos, rot, scale, albedo, emission=(1, 1, 1)):
            self.objects.append((np.array(pos, np.float32), rot_zyx(rot),
                                 np.array(scale, np.float32),
                                 np.array(albedo, np.float32),
                                 np.array(emission, np.float32)))
        add((0, 0, -1), (0, 0, 0), (1, 1, 0.2), (0.4,) * 3)
        add((0, 1, 0), (90, 0, 0), (1, 1, 0.2), (0.4,) * 3)
        add((0, -1, 0), (90, 0, 0), (1, 1, 0.2), (0.4,) * 3)
        add((-1, 0, 0), (0, 90, 0), (1, 1, 0.2), (0.5, 0, 0))
        add((1, 0, 0), (0, 90, 0), (1, 1, 0.2), (0, 0.5, 0))
        add((-0.275, -0.3, -0.2), (0, 112, 0), (0.25, 0.5, 0.25), (0.4,) * 3)
        add((0.275, -0.55, 0.2), (0, -197, 0), (0.25, 0.25, 0.25), (0.4,) * 3)
        add((0, 0.809, 0), (90, 0, 0), (0.2, 0.2, 0.01), (1, 1, 1),
            (100,) * 3)
        self.max_bounce = 3
        self.max_march = 256
        self.t0 = 0.0005
        self.precision = 1e-5
        self.max_dis = 2000.0
        self.light_quality = 128.0
        self.vis_lo = 1e-6

    def nearest(self, p):
        best, bi = 1e3, 0
        for i, (pos, mat, scale, _, _) in enumerate(self.objects):
            pl = mat @ (p - pos)
            d = abs(sd_box_np(pl, scale))
            if d < best:
                best, bi = d, i
        return bi, np.float32(best)

    def march(self, o, d):
        t = np.float32(self.t0)
        idx, hit = 0, False
        for _ in range(self.max_march):
            p = o + t * d
            idx, dist = self.nearest(p)
            hit = dist < self.precision
            t = np.float32(t + dist)  # w = 1
            if hit or t >= self.max_dis:
                break
        return t, idx, hit

    def camera_ray(self, pixel, sample):
        u4 = uniform4_np(pixel, sample, 1)
        i, j = pixel // self.h, pixel % self.h
        u = np.float32((i + u4[0]) / self.w)
        v = np.float32((j + u4[1]) / self.h)
        lookfrom = np.array([0, 0, 3.5], np.float32)
        lookat = np.array([0, 0, -1], np.float32)
        vup = np.array([0, 1, 0], np.float32)
        theta = np.deg2rad(np.float32(35.0))
        hh = np.tan(theta / 2, dtype=np.float32)
        hw = hh  # aspect 1
        z = (lookfrom - lookat)
        z = z / np.linalg.norm(z)
        x = np.cross(vup, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        focus = np.float32(1.0)
        ll = lookfrom - hw * focus * x - hh * focus * y - focus * z
        po = ll + u * 2 * hw * focus * x + v * 2 * hh * focus * y
        rd = po - lookfrom
        rd = rd / np.linalg.norm(rd)
        return lookfrom.astype(np.float32), rd.astype(np.float32)

    def trace(self, pixel, sample):
        o, d = self.camera_ray(pixel, sample)
        color = np.ones(3, np.float32)
        for i in range(self.max_bounce):
            counter = U32(sample * self.max_bounce + i)
            prob = 1.0 - 1.0 / np.exp(np.float32(i) / self.light_quality)
            u = uniform4_np(pixel, counter, 0)[0]
            if u < prob:
                color = color * np.float32(prob)
                break
            t, idx, hit = self.march(o, d)
            pos_hit = o + t * d
            if not hit:
                color = color * 0.0  # black sky
                break
            obj_pos, mat, scale, albedo, emission = self.objects[idx]
            pl = mat @ (pos_hit - obj_pos)
            n = mat.T @ box_normal_np(pl, scale)
            if np.dot(d, n) >= 0:
                n = -n
            u4 = uniform4_np(pixel, counter, 2)
            zc = np.float32(2.0 * u4[0] - 1.0)
            a = np.float32(u4[1] * 2.0 * np.pi)
            xy = np.sqrt(max(1.0 - zc * zc, 0.0), dtype=np.float32)
            sph = np.array([xy * np.sin(a), xy * np.cos(a), zc], np.float32)
            nd = n + sph
            nd = nd / np.linalg.norm(nd)
            color = color * albedo
            intensity = float(color @ [0.299, 0.587, 0.114])
            color = color * emission
            visible = float(color @ [0.299, 0.587, 0.114])
            o, d = pos_hit, nd.astype(np.float32)
            if intensity < visible or visible < self.vis_lo:
                break
        return color

    def render(self, spp):
        img = np.zeros((self.w * self.h, 3), np.float32)
        for pix in range(self.w * self.h):
            acc = np.zeros(3, np.float32)
            for s in range(spp):
                acc += self.trace(pix, s)
            img[pix] = acc / spp
        # x-major flat -> (H, W, 3), top row = v max
        return img.reshape(self.w, self.h, 3).transpose(1, 0, 2)[::-1]
