"""Augmentation transforms vs a numpy reference + algebraic properties."""

import numpy as np

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.operators import augment as A


def _img_df(spark, arr: np.ndarray):
    h, w = arr.shape
    return spark.createDataFrame(
        [(w, h, [float(x) for x in arr.reshape(-1)])],
        "width int, height int, pixels array<double>")


def _run(df, col):
    return np.array(df.select(col.alias("p")).first()["p"])


def _rng_img(seed=3, h=5, w=7):
    return np.round(np.random.RandomState(seed).rand(h, w), 6)


def test_geometric_vs_numpy(spark):
    img = _rng_img()
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")
    assert np.allclose(_run(df, A.flip_horizontal(px, w, h)),
                       img[:, ::-1].reshape(-1))
    assert np.allclose(_run(df, A.flip_vertical(px, w, h)),
                       img[::-1, :].reshape(-1))
    assert np.allclose(_run(df, A.rotate90(px, w, h)),
                       np.rot90(img, k=-1).reshape(-1))
    assert np.allclose(
        _run(df, A.crop(px, w, h, F.lit(2), F.lit(1), F.lit(3), F.lit(2))),
        img[1:3, 2:5].reshape(-1))


def test_photometric_vs_numpy(spark):
    img = _rng_img(seed=9)
    df = _img_df(spark, img)
    px = F.col("pixels")
    assert np.allclose(_run(df, A.brightness(px, F.lit(0.5))),
                       np.clip(img * 0.5, 0, 1).reshape(-1))
    m = img.mean()
    assert np.allclose(_run(df, A.contrast(px, F.lit(1.7))),
                       np.clip(m + 1.7 * (img - m), 0, 1).reshape(-1))
    assert np.allclose(_run(df, A.invert(px)), (1 - img).reshape(-1))
    assert np.allclose(_run(df, A.normalize(px, 0.5, 0.25)),
                       ((img - 0.5) / 0.25).reshape(-1))
    got = _run(df, A.cutout(px, F.col("width"), F.col("height"),
                            F.lit(1), F.lit(2), F.lit(2)))
    exp = img.copy()
    exp[2:4, 1:3] = 0.0
    assert np.allclose(got, exp.reshape(-1))


def test_involutions_and_composition(spark):
    """flip∘flip = id; rotate90 four times = id; transforms compose as one
    Catalyst projection (plan contains a single Project over the scan)."""
    img = _rng_img(seed=11, h=4, w=6)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")
    twice = A.flip_horizontal(A.flip_horizontal(px, w, h), w, h)
    assert np.allclose(_run(df, twice), img.reshape(-1))
    r1 = A.rotate90(px, w, h)            # h x w
    r2 = A.rotate90(r1, h, w)            # w x h
    r3 = A.rotate90(r2, w, h)
    r4 = A.rotate90(r3, h, w)
    assert np.allclose(_run(df, r4), img.reshape(-1))

    composed = A.normalize(
        A.brightness(A.flip_vertical(px, w, h), F.lit(0.9)), 0.5, 0.25)
    out = df.select(composed.alias("p"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1  # fused into one projection
    exp = (np.clip(img[::-1, :] * 0.9, 0, 1) - 0.5) / 0.25
    assert np.allclose(_run(df, composed), exp.reshape(-1))


# --- round-4 additions: affine / photometric completion + policy --------

def _np_affine(img, sr, sc, fill=0.0):
    h, w = img.shape
    out = np.full((h, w), fill)
    for r in range(h):
        for c in range(w):
            rr, cc = sr(r, c), sc(r, c)
            if 0 <= rr < h and 0 <= cc < w:
                out[r, c] = img[rr, cc]
    return out


def _half_up(x):
    return int(np.floor(x + 0.5))


def test_affine_vs_numpy(spark):
    img = _rng_img(seed=21, h=6, w=8)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")

    exp = _np_affine(img, lambda r, c: r, lambda r, c: _half_up(c + 0.4 * r))
    assert np.allclose(_run(df, A.shear_x(px, w, h, F.lit(0.4))),
                       exp.reshape(-1))
    exp = _np_affine(img, lambda r, c: _half_up(r - 0.3 * c), lambda r, c: c)
    assert np.allclose(_run(df, A.shear_y(px, w, h, F.lit(-0.3))),
                       exp.reshape(-1))
    exp = _np_affine(img, lambda r, c: r, lambda r, c: c + 3)
    assert np.allclose(_run(df, A.translate_x(px, w, h, F.lit(3.0))),
                       exp.reshape(-1))
    exp = _np_affine(img, lambda r, c: r - 2, lambda r, c: c)
    assert np.allclose(_run(df, A.translate_y(px, w, h, F.lit(-2.0))),
                       exp.reshape(-1))


def test_rotate_vs_numpy(spark):
    import math
    img = _rng_img(seed=22, h=7, w=7)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")
    th = math.radians(20.0)
    co, si = math.cos(th), math.sin(th)
    cx = cy = 3.0
    exp = _np_affine(
        img,
        lambda r, c: _half_up(si * (c - cx) + co * (r - cy) + cy),
        lambda r, c: _half_up(co * (c - cx) - si * (r - cy) + cx))
    assert np.allclose(_run(df, A.rotate(px, w, h, 20.0)), exp.reshape(-1))
    # rotate(0) is the identity
    assert np.allclose(_run(df, A.rotate(px, w, h, 0.0)), img.reshape(-1))


def test_resize_and_pad_vs_numpy(spark):
    img = _rng_img(seed=23, h=4, w=6)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")

    ow, oh = 3, 8
    exp = np.array([[img[int((r + 0.5) * 4 / oh), int((c + 0.5) * 6 / ow)]
                     for c in range(ow)] for r in range(oh)])
    assert np.allclose(_run(df, A.resize(px, w, h, F.lit(ow), F.lit(oh))),
                       exp.reshape(-1))

    exp = np.pad(img, 2, mode="constant", constant_values=0.25)
    got = _run(df, A.pad(px, w, h, F.lit(2), "constant", fill=0.25))
    assert np.allclose(got, exp.reshape(-1))
    exp = np.pad(img, 2, mode="reflect")
    got = _run(df, A.pad(px, w, h, F.lit(2), "reflect"))
    assert np.allclose(got, exp.reshape(-1))


def _np_q(p):
    return np.minimum(np.floor(p * 256), 255)


def test_photometric_8bit_vs_numpy(spark):
    # b/256 pixels: the exact-binary-fraction regime the corpus uses
    b = (np.arange(24).reshape(4, 6) * 37 + 5) % 256
    img = b / 256.0
    df = _img_df(spark, img)
    px = F.col("pixels")

    step = 2 ** (8 - 3)
    exp = np.floor(_np_q(img) / step) * step / 256.0
    assert np.allclose(_run(df, A.posterize(px, F.lit(3))),
                       exp.reshape(-1))

    exp = np.where(img < 0.5, img, 1.0 - img)
    assert np.allclose(_run(df, A.solarize(px, F.lit(0.5))),
                       exp.reshape(-1))

    lo, hi = img.min(), img.max()
    exp = (img - lo) / (hi - lo)
    assert np.allclose(_run(df, A.auto_contrast(px)), exp.reshape(-1))
    # idempotent: stretching a stretched image is the identity
    assert np.allclose(_run(df, A.auto_contrast(A.auto_contrast(px))),
                       exp.reshape(-1))
    # constant image passes through
    flat = _img_df(spark, np.full((3, 3), 0.5))
    assert np.allclose(_run(flat, A.auto_contrast(F.col("pixels"))), 0.5)


def test_equalize_vs_numpy(spark):
    b = (np.arange(30).reshape(5, 6) * 11 + 3) % 64  # clustered histogram
    img = b / 256.0
    df = _img_df(spark, img)
    q = _np_q(img)
    n = q.size
    cdf = np.array([(q <= v).sum() for v in q.reshape(-1)])
    cdfmin = (q == q.min()).sum()
    exp = (cdf - cdfmin) / (n - cdfmin)
    assert np.allclose(_run(df, A.equalize(F.col("pixels"))), exp)
    flat = _img_df(spark, np.full((3, 3), 0.25))
    assert np.allclose(_run(flat, A.equalize(F.col("pixels"))), 0.25)


def test_sharpness_and_conv_vs_numpy(spark):
    from tecs_hardware_kbc_spark.operators import convolve as CV
    img = _rng_img(seed=24, h=5, w=6)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")

    def np_conv(img, k, border):
        hh, ww = img.shape
        out = np.zeros_like(img)
        for r in range(hh):
            for c in range(ww):
                acc = 0.0
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        kv = k[(dr + 1) * 3 + dc + 1]
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < hh and 0 <= cc < ww:
                            acc += kv * img[rr, cc]
                        elif border == "copy":
                            acc = None
                            break
                    if acc is None:
                        break
                if acc is None:  # border row/col in copy mode
                    out[r, c] = img[r, c]
                else:
                    out[r, c] = acc
        return out

    got = _run(df, CV.conv3x3(px, w, h, CV.SOBEL_X, border="zero"))
    assert np.allclose(got, np_conv(img, CV.SOBEL_X, "zero").reshape(-1))

    smooth_k = [x / 13.0 for x in (1, 1, 1, 1, 5, 1, 1, 1, 1)]
    smooth = np_conv(img, smooth_k, "copy")
    exp = np.clip(smooth + 1.5 * (img - smooth), 0, 1)
    assert np.allclose(_run(df, A.sharpness(px, w, h, F.lit(1.5))),
                       exp.reshape(-1))

    feats = CV.conv_features(px, w, h)
    got = df.select(*(f.alias(f"f{i}") for i, f in enumerate(feats))).first()
    sx = np.abs(np_conv(img, CV.SOBEL_X, "zero")).mean()
    sy = np.abs(np_conv(img, CV.SOBEL_Y, "zero")).mean()
    cs = np.abs(np_conv(img, CV.CENTER_SURROUND, "zero")).mean()
    assert np.allclose([got["f0"], got["f1"], got["f2"]], [sx, sy, cs])


def test_parse_policy(spark):
    """The policy grammar compiles to the same math as the hand-composed
    chain, honors MD/MP/S/PD/PM settings, fuses into one Project, and
    seed-driven draws replay the md5 math."""
    import hashlib

    img = _rng_img(seed=25, h=6, w=6)
    df = _img_df(spark, img).withColumn("url", F.lit("doc://7"))
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")

    out, ow, oh = A.parse_policy(
        "ShearX_L0.5@Posterize_L0.75@Solarize_L0.55@AutoContrast",
        px, w, h)
    manual = A.auto_contrast(
        A.solarize(
            A.posterize(A.shear_x(px, w, h, F.lit(0.15)), F.lit(3)),
            F.lit(0.55)))
    assert np.allclose(_run(df, out), _run(df, manual))
    plan = df.select(out.alias("p"))._jdf.queryExecution() \
             .optimizedPlan().toString()
    assert plan.count("Project") == 1

    # dims flow through RandomCrop with reflect padding
    out, ow, oh = A.parse_policy(
        "RandomCrop_P1_S8_PD2_PMreflect@HorizontalFlip", px, w, h)
    vals = df.select(F.size(out).alias("n"),
                     ow.alias("w"), oh.alias("h")).first()
    assert (vals["n"], vals["w"], vals["h"]) == (64, 8, 8)
    manual_px = A.pad(px, w, h, F.lit(2), "reflect")
    manual = A.flip_horizontal(
        A.crop(manual_px, w + 4, h + 4, F.lit(1), F.lit(1),
               F.lit(8), F.lit(8)),
        F.lit(8), F.lit(8))
    assert np.allclose(_run(df, out), _run(df, manual))

    # seeded: the apply-coin and sign replay hashlib's md5 exactly
    def u(tag):
        hx = hashlib.md5(f"doc://7:{tag}".encode()).hexdigest()
        return int(hx[:8], 16) / 2 ** 32

    out, _, _ = A.parse_policy("TranslateX_P0.5_L0.4_MD5",
                               px, w, h, seed=F.col("url"))
    applied = u("0:TranslateX:p") <= 0.5
    d = -2.0 if u("0:TranslateX:sign") > 0.5 else 2.0
    exp = (_np_affine(img, lambda r, c: r, lambda r, c: _half_up(c + d))
           if applied else img)
    assert np.allclose(_run(df, out), exp.reshape(-1))

    # unknown names raise, like the reference parser
    try:
        A.parse_policy("Nope", px, w, h)
        assert False, "expected ValueError"
    except ValueError:
        pass

# --- round-5 additions: bilinear resize, color jitter, mixup ------------

def test_resize_bilinear_vs_numpy(spark):
    img = _rng_img(seed=26, h=4, w=6)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")
    ow, oh = 9, 3

    def bilerp(r, c):
        sy = (r + 0.5) * 4 / oh - 0.5
        sx = (c + 0.5) * 6 / ow - 0.5
        y0 = max(int(np.floor(sy)), 0)
        x0 = max(int(np.floor(sx)), 0)
        y1, x1 = min(y0 + 1, 3), min(x0 + 1, 5)
        fy = min(max(sy - y0, 0.0), 1.0)
        fx = min(max(sx - x0, 0.0), 1.0)
        top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
        bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
        return top * (1 - fy) + bot * fy

    exp = np.array([[bilerp(r, c) for c in range(ow)] for r in range(oh)])
    got = _run(df, A.resize_bilinear(px, w, h, F.lit(ow), F.lit(oh)))
    assert np.allclose(got, exp.reshape(-1))
    # upscale-then-read identity: resizing to the same dims is exact
    same = _run(df, A.resize_bilinear(px, w, h, F.lit(6), F.lit(4)))
    assert np.allclose(same, img.reshape(-1))


def test_policy_resize_interpolation_and_guards(spark):
    img = _rng_img(seed=27, h=4, w=4)
    df = _img_df(spark, img)
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")

    out, ow, oh = A.parse_policy("Resize_S8_I2", px, w, h)
    manual = A.resize_bilinear(px, w, h, F.lit(8), F.lit(8))
    assert np.allclose(_run(df, out), _run(df, manual))

    import pytest
    with pytest.raises(ValueError, match="probabilistic Resize"):
        A.parse_policy("Resize_P0.5_S8", px, w, h)
    with pytest.raises(ValueError, match="interpolation I1"):
        A.parse_policy("Resize_S8_I1", px, w, h)
    with pytest.raises(ValueError, match="mixup"):
        A.parse_policy("Brightness_A0.4", px, w, h)
    with pytest.raises(ValueError, match="mixup"):
        A.parse_policy("Brightness_R0.5", px, w, h)


def test_reflect_pad_one_pixel_dim(spark):
    # ADVICE r4: reflect with a dimension of 1 used to pmod by 0 -> NULLs
    img = np.array([[0.25, 0.5, 0.75]])  # h=1
    df = _img_df(spark, img)
    got = _run(df, A.pad(F.col("pixels"), F.col("width"), F.col("height"),
                         F.lit(1), "reflect"))
    assert not np.isnan(got).any()
    assert got.shape == (5 * 3,)
    # every padded row mirrors the single source row
    exp_row = np.array([0.5, 0.25, 0.5, 0.75, 0.5])
    assert np.allclose(got.reshape(3, 5), np.tile(exp_row, (3, 1)))


def test_color_jitter_policy(spark):
    """ColorJitter consumes B/C/T: factors are md5 draws in
    [max(0,1-v), 1+v], applied brightness -> contrast -> saturation."""
    import hashlib

    img = _rng_img(seed=28, h=4, w=5)
    df = _img_df(spark, img).withColumn("url", F.lit("doc://3"))
    w, h, px = F.col("width"), F.col("height"), F.col("pixels")

    def u(tag):
        hx = hashlib.md5(f"doc://3:{tag}".encode()).hexdigest()
        return int(hx[:8], 16) / 2 ** 32

    out, _, _ = A.parse_policy("ColorJitter_B0.4_C0.3", px, w, h,
                               seed=F.col("url"))
    bf = 0.6 + u("0:ColorJitter:jb") * 0.8
    cf = 0.7 + u("0:ColorJitter:jc") * 0.6
    step1 = np.clip(img * bf, 0, 1)
    m = step1.mean()
    exp = np.clip(m + cf * (step1 - m), 0, 1)
    assert np.allclose(_run(df, out), exp.reshape(-1))

    import pytest
    with pytest.raises(ValueError, match="seed"):
        A.parse_policy("ColorJitter_B0.4", px, w, h)


def test_mixup_properties(spark):
    """Ring pairing is total and deterministic; lam blends pixel-exactly;
    same_class_ratio=1 keeps every pair inside one class."""
    import pandas as pd

    n = 40
    rows = [(i, i % 3, [float((i * 7 + j) % 16) / 16 for j in range(6)])
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "img_id int, label int, pixels array<double>")

    out = A.mixup(df, alpha=0.5, same_class_ratio=0.0, buckets=4)
    pdf = out.toPandas().set_index("key").sort_index()
    assert len(pdf) == n                       # one output row per input
    assert ((pdf["lam"] >= 0) & (pdf["lam"] <= 1)).all()
    # deterministic: a second run (different partitioning) is identical
    pdf2 = (A.mixup(df.repartition(7), alpha=0.5, same_class_ratio=0.0,
                    buckets=4)
            .toPandas().set_index("key").sort_index())
    pd.testing.assert_frame_equal(pdf, pdf2)

    # blend check: mixed = lam*own + (1-lam)*partner, partner row consistent
    own = {r[0]: np.array(r[2]) for r in rows}
    lab = {r[0]: r[1] for r in rows}
    for key, row in pdf.iterrows():
        exp = row["lam"] * own[key] + (1 - row["lam"]) * own[row["partner_key"]]
        assert np.allclose(np.array(row["pixels"]), exp)
        assert row["partner_label"] == lab[row["partner_key"]]

    # ratio=1: every row joins its class pool -> partner label == label
    same = A.mixup(df, alpha=0.5, same_class_ratio=1.0, buckets=4).toPandas()
    assert (same["label"] == same["partner_label"]).all()
