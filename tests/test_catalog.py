"""Catalog layer: aliases (atomic blue/green flips) and snapshot/restore
(hard-link incremental over immutable index roots).

The contract: an alias flip is atomic and validated (a typo'd root
fails loudly); a restored snapshot serves BYTE-IDENTICAL query results
and passes the deep integrity audit; snapshots of immutable roots share
storage via hard links; verify catches missing/truncated files.
"""

from __future__ import annotations

import json
import os

import pytest

from search_engine_spark import catalog
from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    """Two indexes over different corpus halves — the blue and green."""
    d = tmp_path_factory.mktemp("catalog")
    pdf = generate_transcripts("xs")
    convs = sorted(pdf["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    blue = pdf[pdf["conv_id"].isin(half)]
    green = pdf[~pdf["conv_id"].isin(half)]
    build_index(
        spark, spark.createDataFrame(blue), str(d / "blue"),
        BuildConfig(num_groups=2),
    )
    build_index(
        spark, spark.createDataFrame(green), str(d / "green"),
        BuildConfig(num_groups=2),
    )
    return str(d), str(d / "blue"), str(d / "green")


def _topk(spark, roots_arg: str, q="term0001 term0002"):
    from search_engine_spark.cli import _open_index

    idx = _open_index(spark, roots_arg)
    return [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in idx.topk(q, "disjunctive", 10).collect()
    ]


# -- aliases ----------------------------------------------------------

def test_alias_flip_is_atomic_and_validated(spark, two_indexes, tmp_path):
    cat = str(tmp_path / "cat")
    _d, blue, green = two_indexes
    catalog.alias_set(cat, "serving", [blue])
    assert catalog.alias_get(cat, "serving") == [os.path.abspath(blue)]
    before = _topk(spark, f"alias:{cat}/serving")
    assert before == _topk(spark, blue)
    # the flip: same alias, new root — readers see old or new, no blend
    catalog.alias_set(cat, "serving", [green])
    assert _topk(spark, f"alias:{cat}/serving") == _topk(spark, green)
    # multi-root alias resolves to a MultiIndex read
    catalog.alias_set(cat, "both", [blue, green])
    assert _topk(spark, f"alias:{cat}/both") == _topk(spark, f"{blue},{green}")
    assert sorted(catalog.alias_list(cat)) == ["both", "serving"]
    catalog.alias_delete(cat, "both")
    assert sorted(catalog.alias_list(cat)) == ["serving"]
    with pytest.raises(ValueError, match="not found"):
        catalog.alias_get(cat, "both")
    with pytest.raises(ValueError, match="not an index root"):
        catalog.alias_set(cat, "bad", [str(tmp_path / "nope")])
    with pytest.raises(ValueError, match="invalid alias name"):
        catalog.alias_set(cat, "../escape", [blue])


def test_resolve_index_arg_passthrough(tmp_path):
    assert catalog.resolve_index_arg("/a/idx") == "/a/idx"
    assert catalog.resolve_index_arg("/a,/b") == "/a,/b"
    with pytest.raises(ValueError, match="alias:<catalog>/<name>"):
        catalog.resolve_index_arg("alias:noslash")


# -- snapshots --------------------------------------------------------

def test_snapshot_restore_round_trip(spark, two_indexes, tmp_path):
    _d, blue, green = two_indexes
    repo = str(tmp_path / "repo")
    m = catalog.snapshot_create(repo, "s1", [blue, green])
    assert len(m["roots"]) == 2
    # immutable roots on one filesystem -> hard links, not copies
    assert m["linked"] > 0 and m["copied"] == 0
    v = catalog.snapshot_verify(repo, "s1")
    assert v["ok"] and v["files"] == m["linked"] + m["copied"]

    dest = str(tmp_path / "restored")
    roots = catalog.snapshot_restore(repo, "s1", dest)
    assert len(roots) == 2
    # byte-identical serving: single-segment and joint reads both match
    assert _topk(spark, roots[0]) == _topk(spark, blue)
    assert _topk(spark, ",".join(roots)) == _topk(spark, f"{blue},{green}")
    # the deep tier: the restored root passes the integrity audit
    from search_engine_spark.index.check import check_index

    report = check_index(spark, roots[0], deep=True)
    assert report["ok"], report


def test_snapshot_verify_catches_tamper_and_guards(two_indexes, tmp_path):
    _d, blue, _green = two_indexes
    repo = str(tmp_path / "repo2")
    catalog.snapshot_create(repo, "s1", [blue])
    with pytest.raises(ValueError, match="already exists"):
        catalog.snapshot_create(repo, "s1", [blue])
    snap = os.path.join(repo, catalog.SNAP_DIR, "s1")
    with open(os.path.join(snap, "_manifest.json")) as f:
        manifest = json.load(f)
    rel, _size = manifest["roots"][0]["files"][0]
    victim = os.path.join(snap, "seg0000", rel)
    os.remove(victim)  # hard link: removing the snapshot's name leaves
    # the source untouched (nlink only drops)
    v = catalog.snapshot_verify(repo, "s1")
    assert not v["ok"] and v["missing"] == [f"seg0000/{rel}"]
    assert os.path.exists(os.path.join(blue, rel))  # source unharmed
    with pytest.raises(ValueError, match="not empty"):
        d = tmp_path / "occupied"
        d.mkdir()
        (d / "x").write_text("x")
        catalog.snapshot_restore(repo, "s1", str(d))
    assert catalog.snapshot_list(repo) == ["s1"]
    catalog.snapshot_delete(repo, "s1")
    assert catalog.snapshot_list(repo) == []


def test_snapshot_retry_after_crashed_attempt(two_indexes, tmp_path):
    """A manifest-less remnant (crashed create) must not wedge the
    snapshot name — the retry clears it and succeeds."""
    _d, blue, _green = two_indexes
    repo = str(tmp_path / "repo3")
    remnant = os.path.join(repo, catalog.SNAP_DIR, "s1", "seg0000")
    os.makedirs(remnant)
    with open(os.path.join(remnant, "partial"), "w") as f:
        f.write("x")
    m = catalog.snapshot_create(repo, "s1", [blue])
    assert catalog.snapshot_verify(repo, "s1")["ok"]
    assert not os.path.exists(os.path.join(
        repo, catalog.SNAP_DIR, "s1", "seg0000", "partial"
    ))
    with pytest.raises(ValueError, match="already exists"):
        catalog.snapshot_create(repo, "s1", [blue])


@pytest.mark.parametrize("bad", ["", "/", "a/b", ".", "..", ".hidden"])
def test_snapshot_name_validation_guards_rmtree(two_indexes, tmp_path, bad):
    """Snapshot names follow the SAME rule as alias names (reject empty,
    '/', leading '.').  Load-bearing: name='..' resolves to the snapshot
    repository itself and name='.' to the snapshots dir, both upstream
    of shutil.rmtree in create's remnant cleanup and in delete — a typo
    must fail loud, never delete the repository."""
    _d, blue, _green = two_indexes
    repo = str(tmp_path / "repo4")
    catalog.snapshot_create(repo, "keeper", [blue])
    for fn in (
        lambda: catalog.snapshot_create(repo, bad, [blue]),
        lambda: catalog.snapshot_delete(repo, bad),
        lambda: catalog.snapshot_verify(repo, bad),
        lambda: catalog.snapshot_restore(repo, bad, str(tmp_path / "out")),
    ):
        with pytest.raises(ValueError, match="invalid snapshot name"):
            fn()
    # the repository survived every rejected call
    assert catalog.snapshot_list(repo) == ["keeper"]
    assert catalog.snapshot_verify(repo, "keeper")["ok"]
