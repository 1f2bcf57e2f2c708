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
