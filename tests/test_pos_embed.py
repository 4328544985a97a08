"""Golden-value tests for positional embeddings vs the reference formulas
(models/pos_embed.py:15-63, 97-109), re-derived independently here."""
import numpy as np

from ssl_audio_tpu.ops.pos_embed import get_2d_sincos_pos_embed, get_sinusoid_encoding_table


def ref_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def ref_2d(embed_dim, grid_sizes, cls_token=True):
    gH, gW = grid_sizes
    grid = np.meshgrid(np.arange(gW, dtype=np.float32), np.arange(gH, dtype=np.float32))
    grid = np.stack(grid, axis=0).reshape([2, 1, gH, gW])
    emb_h = ref_1d(embed_dim // 2, grid[0])
    emb_w = ref_1d(embed_dim // 2, grid[1])
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb


def test_2d_sincos_matches_reference_formula():
    for grid in [(4, 6), (8, 12), (4, 4)]:
        ours = get_2d_sincos_pos_embed(768, grid, cls_token=True)
        ref = ref_2d(768, grid, cls_token=True)
        assert ours.shape == (grid[0] * grid[1] + 1, 768)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_2d_sincos_no_cls():
    ours = get_2d_sincos_pos_embed(192, (4, 6), cls_token=False)
    assert ours.shape == (24, 192)
    np.testing.assert_allclose(ours, ref_2d(192, (4, 6), cls_token=False), atol=1e-6)


def test_sinusoid_table():
    d = 384
    table = get_sinusoid_encoding_table(24, d, cls_token=True)
    assert table.shape == (25, d)
    # spot-check the interleaved formula
    pos, j = 5, 10
    expect_sin = np.sin(pos / np.power(10000, 2 * (j // 2) / d))
    np.testing.assert_allclose(table[pos + 1, j], expect_sin, atol=1e-6)
    expect_cos = np.cos(pos / np.power(10000, 2 * ((j + 1) // 2) / d))
    np.testing.assert_allclose(table[pos + 1, j + 1], expect_cos, atol=1e-6)
    assert np.all(table[0] == 0)
