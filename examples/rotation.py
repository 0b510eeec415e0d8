"""Affine rotation via affine_grid + grid_pull.

Script port of the reference's examples/rotation.ipynb: build a rotation
matrix about the image center and resample with cubic splines.

Run:  python examples/rotation.py
"""
import math

import numpy as np
import jax.numpy as jnp

import interpol_tpu as itp


def rotation_matrix_2d(theta, center):
    c, s = math.cos(theta), math.sin(theta)
    A = np.eye(3)
    A[:2, :2] = [[c, -s], [s, c]]
    A[:2, 2] = center - A[:2, :2] @ center
    return A


def main():
    H = W = 192
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    image = np.exp(-(((yy - 70) / 25.) ** 2 + ((xx - 96) / 14.) ** 2))

    A = rotation_matrix_2d(math.radians(30),
                           np.array([(H - 1) / 2, (W - 1) / 2]))
    grid = itp.affine_grid(jnp.asarray(A), (H, W))
    rotated = itp.grid_pull(image, grid, interpolation=3, bound="dct2",
                            extrapolate=True, prefilter=True)
    print("input mass ", float(image.sum()))
    print("output mass", float(rotated.sum()))
    print("shape", rotated.shape)


if __name__ == "__main__":
    main()
