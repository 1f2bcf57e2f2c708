"""Frozen quality-model artifact (see quality_model.py).

Trained once by the dev-fit/test-report recipe pinned in
tests/test_quality_model.py: sf0.01 documents with planted
positive markers ("editorial archive longform verified citation",
sources src0/src2) vs negative markers ("clickbait spam adfarm
popup tracker"), dev = hash_u(doc_id, "qmdev") < 0.5, logistic
regression over 1024-bucket hashed bag-of-words (HASH_SEED "qf").
Held-out accuracy at freeze time: 1.00 (252 test docs). A real
deployment retrains on its own labeled sample and freezes here
the same way ivf_centroids.py freezes k-means cells.
"""

FROZEN_QUALITY_MODEL = {
    "bias": -0.11114082390134165,
    "weights": {
        1: -0.7250637814473064,
        9: -0.0545864900879292,
        22: 0.614104739274758,
        56: 0.03429921639830563,
        68: 0.614104739274758,
        109: 0.03541705846822172,
        161: -0.013555331413788934,
        216: -0.035632789514090844,
        225: -0.07315108883223755,
        244: -0.7250637814473064,
        273: -0.019959160352090874,
        299: -0.03737533164270086,
        319: -0.7250637814473064,
        331: -0.03848506959270905,
        395: -0.7250637814473064,
        412: 0.011044010046097775,
        455: 0.07160395633520383,
        458: -0.03489055096606525,
        499: -0.03965787791206066,
        536: -0.04157099200305352,
        631: -0.7250637814473064,
        654: 0.614104739274758,
        783: 0.026483064259260253,
        794: -0.04128393591333539,
        800: 0.06028749629957678,
        819: 0.023368301977606247,
        848: 0.614104739274758,
        874: 0.043933843782531116,
        877: 0.614104739274758,
        879: 0.016530010603212235,
        916: -0.011965342256550214,
        920: 0.004572290295566458,
        924: 0.007467080171041468,
        935: -0.04649694666860697,
        941: 0.013981188156700942,
        942: -0.05969069732720742,
        949: -0.09829671353879094,
        1001: 0.0031876920091318413,
        1019: -0.012350575874209688,
    },
}
