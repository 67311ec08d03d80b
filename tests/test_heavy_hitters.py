"""SpaceSaving heavy-hitters: the per-summary truncation must never lose
a true heavy hitter (the sketch's recall guarantee), and the registered
query's exact verify pass must make the output identical to a plain
counted ground truth — exercised on a skewed corpus whose vocabulary is
far larger than SS_CAP so truncation actually happens."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ssufid_ray.stages.sketches import (HH_PHI_DEN, HH_PHI_NUM, SS_CAP,
                                        heavy_hitters)


def test_heavy_hitters_skewed_vocab_beyond_cap(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vocab = [f"tok{i:05d}" for i in range(SS_CAP * 40)]  # 5120 >> SS_CAP
    heavy = ["alpha", "beta", "gamma"]
    texts = []
    for i in range(400):
        # ~30% of tokens are the three heavy ones, rest a long tail
        toks = list(rng.choice(vocab, size=17))
        toks += [heavy[j] for j in range(3) for _ in range(2)]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    pq.write_table(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(tmp_path / "documents.parquet"))

    got = heavy_hitters(str(tmp_path))

    c = Counter()
    for t in texts:
        c.update(t.split())
    total = sum(c.values())
    thresh = (HH_PHI_NUM * total + HH_PHI_DEN - 1) // HH_PHI_DEN
    want = pd.DataFrame(sorted((k, v) for k, v in c.items() if v >= thresh),
                        columns=["token", "n"])
    assert set(want["token"]) == set(heavy)  # fixture sanity
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"n": "int64"}).reset_index(drop=True))
