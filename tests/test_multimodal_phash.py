"""DCT perceptual hash: noise invariance, group separation, and the
pigeonhole band join's exactness against brute-force Hamming."""

from __future__ import annotations

import numpy as np

from data_eng_project_spark.operators.dedup import fingerprint_hamming_pairs
from data_eng_project_spark.operators.multimodal import (
    attach_noise_grouped_images,
    phash_image,
    phash_images,
)
from data_eng_project_spark.tables import load_table


def test_phash_invariant_to_small_noise_and_resize():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    h0 = phash_image(img)
    # a few perturbed pixels barely move low-frequency DCT coefficients
    noisy = img.copy()
    for _ in range(5):
        noisy[rng.randint(48), rng.randint(64)] = rng.randint(0, 256, size=3)
    assert bin(h0 ^ phash_image(noisy)).count("1") <= 6
    # unrelated image is far away
    other = np.random.RandomState(8).randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
    assert bin(h0 ^ phash_image(other)).count("1") >= 16


def test_phash_pairs_find_groups_exactly(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fp = phash_images(attach_noise_grouped_images(docs, groups=40))
    pairs = fingerprint_hamming_pairs(
        fp, "phash", id_col="doc_id", n_bands=8, max_hamming=6
    ).collect()
    # every reported pair is same-group (no cross-group false positives
    # at this radius), and the band join is EXACT vs brute force
    hashes = {r["doc_id"]: r["phash"] for r in fp.collect()}
    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 6
    }
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == brute
    assert len(got) > 0
    assert all(a % 40 == b % 40 for a, b in got)


def test_same_group_pairs_recalled(spark, sf_dir):
    """Same-base images with a few perturbed pixels must be detected."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(80)
    fp = phash_images(attach_noise_grouped_images(docs, groups=10))
    pairs = fingerprint_hamming_pairs(
        fp, "phash", id_col="doc_id", n_bands=8, max_hamming=6
    ).count()
    # 80 docs over 10 groups -> 8 per group -> 28 pairs per group ideal;
    # demand the overwhelming majority despite pixel noise
    assert pairs >= 200


def test_audio_fingerprint_match_recovers_cropped_copies(spark):
    """Planted truth: cropped (time-shifted) copies of catalog melodies
    must each match their original with a consistent negative offset
    and dominant vote count."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.operators.multimodal import (
        attach_melody_audio,
        audio_fingerprints,
        audio_match_votes,
        decode_raw_audio,
        encode_raw_audio,
    )

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    catalog = attach_melody_audio(docs)
    index_fps = audio_fingerprints(catalog).localCheckpoint()

    def crop(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                samples, sr = decode_raw_audio(bytes(pl))
                ids.append(int(doc_id) + 1000)
                payloads.append(encode_raw_audio(samples[800:], sr))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    probes = attach_melody_audio(
        docs.filter(F.col("doc_id") % 5 == 0)
    ).mapInPandas(crop, schema="doc_id long, payload binary")
    out = {r["probe_id"]: r for r in audio_match_votes(
        audio_fingerprints(probes), index_fps
    ).collect()}
    assert set(out) == {1000, 1005, 1010, 1015, 1020, 1025}
    for pid, r in out.items():
        assert r["matched_id"] == pid - 1000, r
        assert r["offset"] >= 5  # ~0.1s crop ≈ 6 hops later in the original
        assert r["votes"] >= 2


def test_scene_cut_detection_recovers_planted_scene_structure(spark):
    """attach_scene_video plants 2 + id%3 scenes with hard cuts; the
    detector must recover exactly that many scenes per clip, with cut
    frames strictly increasing and intra-scene motion never flagged."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.operators.multimodal import (
        attach_scene_video,
        detect_scene_cuts,
    )

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    out = detect_scene_cuts(attach_scene_video(docs)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(30))
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["scene_idx"])
        expected_scenes = 2 + doc_id % 3
        assert len(rows) == expected_scenes, (doc_id, rows)
        frames = [r["cut_frame"] for r in rows]
        assert frames[0] == 0 and frames == sorted(frames)
        assert all(r["diff"] > 8.0 for r in rows[1:])


def test_bilinear_resize_identity_and_png_roundtrip_property():
    """Property (r5 review): same-size bilinear resize is the identity
    (target pixel centers map exactly onto source centers), and the
    stdlib PNG codec round-trips arbitrary RGB content at arbitrary
    small dimensions — not just the fixed-filter fixtures."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_eng_project_spark.operators.multimodal import (
        bilinear_resize,
        decode_png,
        encode_png,
    )

    @given(
        st.integers(1, 24),
        st.integers(1, 24),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (bilinear_resize(img, w, h) == img).all()
        assert (decode_png(encode_png(img)) == img).all()

    check()


def test_audio_match_accuracy_report_grades_planted_truth(spark):
    """The report's booleans must grade the same planted-truth facts
    the direct audio_match_votes test asserts — and a WRONG id_shift
    must flip all_matched_origin (the boolean is measured, not
    asserted)."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.operators.multimodal import (
        attach_melody_audio,
        audio_fingerprints,
        audio_match_accuracy_report,
        audio_match_votes,
        decode_raw_audio,
        encode_raw_audio,
    )

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    index_fps = audio_fingerprints(attach_melody_audio(docs)).localCheckpoint()

    def crop(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                samples, sr = decode_raw_audio(bytes(pl))
                ids.append(int(doc_id) + 1000)
                payloads.append(encode_raw_audio(samples[800:], sr))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    probe_docs = docs.filter(F.col("doc_id") % 5 == 0)
    probes = attach_melody_audio(probe_docs).mapInPandas(
        crop, schema="doc_id long, payload binary"
    )
    matches = audio_match_votes(
        audio_fingerprints(probes), index_fps
    ).localCheckpoint()
    r = audio_match_accuracy_report(
        matches, probe_docs, id_shift=1000, offset_min=5, offset_max=8,
        include_metrics=True,
    ).collect()[0]
    assert r["n_probes"] == 6
    assert r["n_matched"] == r["n_origin"] == r["n_offset_ok"] == 6
    assert bool(r["all_matched_origin"]) and bool(r["offsets_aligned"])
    # Sensitivity: a wrong shift must fail the origin contract.
    bad = audio_match_accuracy_report(
        matches, probe_docs, id_shift=999, offset_min=5, offset_max=8
    ).collect()[0]
    assert not bool(bad["all_matched_origin"])


def test_audio_match_survives_arbitrary_crop_offsets(spark):
    """The round-9 crop-robustness property, generalized beyond the
    fixed 800-sample crop the report uses: for ANY crop length (the
    window phase shifts by an arbitrary non-integer number of hops),
    stable-run onsets + quantized deltas + vote tolerance must still
    recover every probe's origin clip, with the winning offset inside
    the band implied by that crop (crop/hop with +/-1 slack on each
    side for window-boundary rounding and the vote smear)."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.operators.multimodal import (
        attach_melody_audio,
        audio_fingerprints,
        audio_match_votes,
        decode_raw_audio,
        encode_raw_audio,
    )

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    index_fps = audio_fingerprints(attach_melody_audio(docs)).localCheckpoint()

    # crop lengths chosen to hit distinct hop phases (hop=128): exact
    # multiples, quarter/half phases, and a crop deep into note 2.
    for crop in (128, 320, 512, 700, 1100, 1500):

        def crop_fn(it, crop=crop):
            import pandas as pd

            for pdf in it:
                ids, payloads = [], []
                for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                    samples, sr = decode_raw_audio(bytes(pl))
                    ids.append(int(doc_id) + 1000)
                    payloads.append(encode_raw_audio(samples[crop:], sr))
                yield pd.DataFrame({"doc_id": ids, "payload": payloads})

        probes = attach_melody_audio(
            docs.filter(F.col("doc_id") % 4 == 0)
        ).mapInPandas(crop_fn, schema="doc_id long, payload binary")
        out = {
            r["probe_id"]: r
            for r in audio_match_votes(
                audio_fingerprints(probes), index_fps
            ).collect()
        }
        assert set(out) == {1000, 1004, 1008, 1012, 1016}, (crop, sorted(out))
        lo, hi = crop // 128 - 1, -(-crop // 128) + 1
        for pid, r in out.items():
            assert r["matched_id"] == pid - 1000, (crop, dict(r.asDict()))
            assert lo <= r["offset"] <= hi, (crop, dict(r.asDict()))
