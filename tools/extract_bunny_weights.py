"""One-time extraction of the neural-bunny MLP weights into an .npz asset.

The Stanford-bunny SDF in the reference is a hard-coded sin-activated MLP
(originally from the public shadertoy wtVyWK; transcribed in
``/root/reference/examples/bunny/bunny_sdf_glass.py:150-203``). The weights
are *data*, not code — this script parses the numeric literals out of the
reference file once and stores them as dense arrays in
``assets/bunny_mlp.npz`` with the layout used by
``raytracingpbr_tpu.ops.sdf.sd_bunny``:

    w_in  (3, 16)  b_in  (16,)   f0 = sin(p @ w_in + b_in)
    w_h1 (16, 16)  b_h1  (16,)   f1 = sin(f0 @ w_h1 + b_h1) + f0
    w_h2 (16, 16)  b_h2  (16,)   f2 = sin(f1 @ w_h2 + b_h2)/1.4 + f1
    w_out (16,)                  sd = f2 @ w_out - 0.16

Derivation of the layout from the source text:
  * input layer: ``f0k = sin(p.y*Ak + p.z*Bk - p.x*Ck + Dk)`` for four vec4
    lanes k=0..3 -> rows of w_in are (-C, A, B) per output unit.
  * hidden layers: Taichi ``vec4 @ mat4(m00..m33)`` is a row-vector times a
    row-major matrix, so block (j,k) of the 16x16 weight is the mat4 given in
    lane k's expression for f_j, laid out row-major.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import re
import sys

import numpy as np

SRC = "/root/reference/examples/bunny/bunny_sdf_glass.py"
OUT = "assets/bunny_mlp.npz"

FLOAT = r"[-+]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?"


def floats(s):
    return [float(x) for x in re.findall(FLOAT, s)]


def main():
    text = open(SRC).read()
    # Grab the sd_bunny body (between 'def sd_bunny' and the following 'return sd').
    m = re.search(r"def sd_bunny.*?return sd", text, re.S)
    body = m.group(0)
    # Normalize whitespace/newlines inside statements: statements are the
    # f.. = sin( ... ) assignments; they span lines joined by '+\n'.
    body = body.replace("\n", " ")

    # --- input layer ---
    # f0k = sin(p.y*vec4(A)+p.z*vec4(B)-p.x*vec4(C)+vec4(D))
    in_pat = re.compile(
        r"f0(\d)=sin\(p\.y\*vec4\(([^)]*)\)\+p\.z\*vec4\(([^)]*)\)"
        r"-p\.x\*vec4\(([^)]*)\)\+vec4\(([^)]*)\)\)"
    )
    w_in = np.zeros((3, 16))
    b_in = np.zeros(16)
    found_in = 0
    for mm in in_pat.finditer(body.replace(" ", "")):
        k = int(mm.group(1))
        A, B, C, D = (floats(mm.group(i)) for i in range(2, 6))
        sl = slice(4 * k, 4 * k + 4)
        w_in[0, sl] = -np.array(C)  # -p.x coefficient
        w_in[1, sl] = np.array(A)   # p.y
        w_in[2, sl] = np.array(B)   # p.z
        b_in[sl] = np.array(D)
        found_in += 1
    assert found_in == 4, found_in

    # --- hidden layers ---
    # Statements like: fXk=sin(fY0@mat4(..16..)+fY1@mat4(..)+fY2@mat4(..)+
    #                  fY3@mat4(..)+vec4(..4..))[/1.4]+fYk
    hid_pat = re.compile(
        r"f(\d)(\d)=sin\("
        r"f\d\d@mat4\(([^)]*)\)\+"
        r"f\d\d@mat4\(([^)]*)\)\+"
        r"f\d\d@mat4\(([^)]*)\)\+"
        r"f\d\d@mat4\(([^)]*)\)\+"
        r"vec4\(([^)]*)\)\)(/1\.4)?\+f\d\d"
    )
    # Two hidden layers appear in source order: first the f1x block (reads
    # f0*), then the f0x re-assignments (reads f1*) which form layer 2.
    layers = []  # list of (w (16,16), b (16,))
    cur_w, cur_b, lanes = np.zeros((16, 16)), np.zeros(16), 0
    for mm in hid_pat.finditer(body.replace(" ", "")):
        k = int(mm.group(2))
        mats = [floats(mm.group(i)) for i in range(3, 7)]
        bias = floats(mm.group(7))
        for j, mat in enumerate(mats):
            assert len(mat) == 16
            # block (rows 4j..4j+4, cols 4k..4k+4), row-major mat4
            cur_w[4 * j:4 * j + 4, 4 * k:4 * k + 4] = np.array(mat).reshape(4, 4)
        assert len(bias) == 4
        cur_b[4 * k:4 * k + 4] = np.array(bias)
        lanes += 1
        if lanes == 4:
            layers.append((cur_w, cur_b))
            cur_w, cur_b, lanes = np.zeros((16, 16)), np.zeros(16), 0
    assert len(layers) == 2, len(layers)
    (w_h1, b_h1), (w_h2, b_h2) = layers

    # --- output layer ---
    out_pat = re.compile(
        r"sd=dot\(f00,vec4\(([^)]*)\)\)\+dot\(f01,vec4\(([^)]*)\)\)"
        r"\+dot\(f02,vec4\(([^)]*)\)\)\+dot\(f03,vec4\(([^)]*)\)\)-0\.16"
    )
    mm = out_pat.search(body.replace(" ", ""))
    w_out = np.concatenate([np.array(floats(mm.group(i))) for i in range(1, 5)])
    assert w_out.shape == (16,)

    np.savez(
        OUT,
        w_in=w_in.astype(np.float32), b_in=b_in.astype(np.float32),
        w_h1=w_h1.astype(np.float32), b_h1=b_h1.astype(np.float32),
        w_h2=w_h2.astype(np.float32), b_h2=b_h2.astype(np.float32),
        w_out=w_out.astype(np.float32),
        bias_out=np.float32(-0.16),
    )
    print("wrote", OUT)
    for name, arr in [("w_in", w_in), ("b_in", b_in), ("w_h1", w_h1),
                      ("b_h1", b_h1), ("w_h2", w_h2), ("b_h2", b_h2),
                      ("w_out", w_out)]:
        print(f"  {name}: shape={arr.shape} mean={arr.mean():+.4f}")


if __name__ == "__main__":
    sys.exit(main())
