"""Video star-schema pipeline: DataFrame plumbing vs pure-Python
reference-semantics assembly, per-video and per-container."""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.video import (
    assemble_transcripts,
    container_documents,
    organize_by_chapters_df,
    organize_transcript_by_chapters,
    render_video_complete,
    render_video_raw,
    strip_timestamps_raw,
    top_comments,
    transcript_line,
    video_documents,
)
from web_scraper_spark.sources.youtube import (
    chapters_df,
    comments_df,
    containers_df,
    gen_video_rows,
    transcripts_df,
    video_id_of,
    videos_df,
)

N = 12


def py_transcript(data, with_ts=True):
    rows = sorted(data["transcript"], key=lambda r: r["pos"])
    if with_ts:
        return "\n".join(transcript_line(r["start"], r["text"]) for r in rows)
    return "\n".join(r["text"] for r in rows)


def test_transcript_assembly_parity(spark):
    t = transcripts_df(spark, N)
    got = {r["video_id"]: r["transcript"] for r in assemble_transcripts(t).collect()}
    for i in range(N):
        data = gen_video_rows(i)
        assert got[video_id_of(i)] == py_transcript(data), i


def test_chapter_organization_parity(spark):
    """The relational anchor-join organization must equal the
    reference's sequential cursor algorithm (incl. quirk Q12) for
    every generated video that has chapters."""
    t = transcripts_df(spark, N)
    ch = chapters_df(spark, N)
    got = {r["video_id"]: r["organized"] for r in organize_by_chapters_df(t, ch).collect()}
    n_checked = 0
    for i in range(N):
        data = gen_video_rows(i)
        if not data["chapters"]:
            assert video_id_of(i) not in got
            continue
        expect = organize_transcript_by_chapters(py_transcript(data), data["chapters"])
        assert got[video_id_of(i)] == expect, i
        n_checked += 1
    assert n_checked >= 6


def test_quirk_q12_header_before_first_line():
    # transcript entirely before chapter 0's start: header still emitted
    tr = "[1.0s] early line"
    chapters = [{"start_time": 5.0, "title": "Intro"}, {"start_time": 99.0, "title": "Late"}]
    out = organize_transcript_by_chapters(tr, chapters)
    assert out == "## Intro\nearly line"


def test_quirk_q12_nontimestamped_never_advances():
    tr = "plain line\n[50.0s] after"
    chapters = [{"start_time": 0.0, "title": "A"}, {"start_time": 10.0, "title": "B"}]
    out = organize_transcript_by_chapters(tr, chapters)
    # plain line stays in chapter A; the 50s line advances to B
    assert out == "## A\nplain line\n\n## B\nafter"


def test_top_comments_cap_and_null_likes(spark):
    c = comments_df(spark, N)
    ranked = top_comments(c, 30)
    per_video = ranked.groupBy("video_id").count().collect()
    for r in per_video:
        assert r["count"] <= 30
    # ordering: like_count desc with None as 0, tie by comment_id
    one = [
        (r["like_count"], r["comment_id"])
        for r in ranked.filter(F.col("video_id") == video_id_of(0))
        .orderBy("rank")
        .collect()
    ]
    likes = [lc if lc is not None else 0 for lc, _ in one]
    assert likes == sorted(likes, reverse=True)


def test_video_documents_complete_parity(spark):
    docs = video_documents(
        videos_df(spark, N), transcripts_df(spark, N),
        chapters_df(spark, N), comments_df(spark, N), style="complete",
    )
    got = {r["video_id"]: r["doc"] for r in docs.collect()}
    assert len(got) == N
    i = 1
    data = gen_video_rows(i)
    v = data["video"]
    roots = [c for c in data["comments"] if c["parent"] == "root"]
    ranked = sorted(roots, key=lambda c: (-(c["like_count"] or 0), c["comment_id"]))[:30]
    expect = render_video_complete(
        v["title"], v["channel"], v["url"], v["description"],
        py_transcript(data), [(c["author"], c["text"]) for c in ranked],
    )
    assert got[video_id_of(i)] == expect


def test_video_documents_raw_strip(spark):
    docs = video_documents(
        videos_df(spark, N), transcripts_df(spark, N),
        chapters_df(spark, N), comments_df(spark, N), style="raw",
    )
    one = docs.filter(F.col("video_id") == video_id_of(2)).collect()[0]["doc"]
    data = gen_video_rows(2)
    v = data["video"]
    expect = render_video_raw(v["title"], v["channel"], v["url"], py_transcript(data, with_ts=False))
    assert one == expect
    assert "[" not in one.split("Transcript:")[1]


def test_container_documents_cap_and_index(spark):
    vids = videos_df(spark, N)
    docs = video_documents(
        vids, transcripts_df(spark, N), chapters_df(spark, N),
        comments_df(spark, N), style="complete", standalone=False,
    )
    out = container_documents(containers_df(spark, N), vids, docs, style="complete", max_videos=3)
    rows = {r["container_id"]: r["doc"] for r in out.collect()}
    # playlists p0..p2 and channels ch0..ch4
    assert set(rows) == {"p0", "p1", "p2", "ch0", "ch1", "ch2", "ch3", "ch4"}
    p0 = rows["p0"]
    assert p0.startswith("# YouTube Playlist")
    assert "Videos: 3" in p0  # capped at max_videos
    assert "## Videos in this Playlist" in p0
    assert p0.count("\n---\n") == 2  # separators between 3 docs
    ch0 = rows["ch0"]
    assert ch0.startswith("# YouTube Channel: channel-0")


def test_strip_timestamps_raw_variant_drops_bracketless():
    # Q8 variant A quirk: in a transcript containing brackets, lines
    # WITHOUT brackets are dropped entirely
    t = "[1.0s] a\nplain\n[2.0s] b"
    assert strip_timestamps_raw(t) == "a\nb"


def _py_expected_doc(i: int, style: str, standalone: bool = True) -> str:
    """Driver-side oracle: render video i with the pure-Python
    reference-semantics renderers from the raw fixture rows."""
    from web_scraper_spark.operators.video import render_video_chapters

    data = gen_video_rows(i)
    v = data["video"]
    if style == "raw":
        return render_video_raw(
            v["title"], v["channel"], v["url"], py_transcript(data, with_ts=False)
        )
    if style == "chapters":
        chs = sorted(data["chapters"], key=lambda c: c["k"])
        return render_video_chapters(
            v["title"], v["channel"], v["url"], v["description"],
            py_transcript(data), chs,
        )
    roots = [c for c in data["comments"] if c["parent"] == "root"]
    ranked = sorted(roots, key=lambda c: (-(c["like_count"] or 0), c["comment_id"]))[:30]
    return render_video_complete(
        v["title"], v["channel"], v["url"], v["description"],
        py_transcript(data), [(c["author"], c["text"]) for c in ranked],
        standalone=standalone,
    )


@pytest.mark.parametrize("style", ["complete", "raw", "chapters"])
def test_render_exprs_match_python_renderers(spark, style):
    """video_documents now renders every style as a pure Column
    expression — each must byte-match the Python reference renderer
    for EVERY fixture video (incl. chapter-less videos, empty
    descriptions, and the no-timestamp transcript lines)."""
    docs = {
        r["video_id"]: r["doc"]
        for r in video_documents(
            videos_df(spark, N), transcripts_df(spark, N),
            chapters_df(spark, N), comments_df(spark, N), style=style,
        ).collect()
    }
    assert len(docs) == N
    for i in range(N):
        assert docs[video_id_of(i)] == _py_expected_doc(i, style), f"video {i} ({style})"


def test_render_complete_expr_container_variant(spark):
    """standalone=False ('##' headings, 5-comment cap) parity."""
    docs = {
        r["video_id"]: r["doc"]
        for r in video_documents(
            videos_df(spark, N), transcripts_df(spark, N),
            chapters_df(spark, N), comments_df(spark, N),
            style="complete", standalone=False,
        ).collect()
    }
    for i in range(N):
        assert docs[video_id_of(i)] == _py_expected_doc(
            i, "complete", standalone=False
        ), f"video {i}"


@pytest.mark.parametrize("style", ["complete", "raw"])
def test_container_expr_matches_python_renderer(spark, style):
    """The Column-expression container assembly must byte-match the
    Python render_container oracle for every container (playlists and
    channels, capped member lists, both styles)."""
    from web_scraper_spark.operators.video import render_container

    vids = videos_df(spark, N)
    docs = video_documents(
        vids, transcripts_df(spark, N), chapters_df(spark, N),
        comments_df(spark, N), style=style,
        standalone=(style != "complete"),
    )
    out = {
        r["container_id"]: r["doc"]
        for r in container_documents(
            containers_df(spark, N), vids, docs, style=style, max_videos=3
        ).collect()
    }
    # driver-side oracle: rebuild each container's capped member list
    members = sorted(
        containers_df(spark, N).collect(),
        key=lambda r: (r["container_id"], r["position"], r["video_id"]),
    )
    vid_meta = {r["video_id"]: r for r in vids.collect()}
    doc_map = {r["video_id"]: r["doc"] for r in docs.collect()}
    by_container = {}
    for m in members:
        by_container.setdefault((m["container_id"], m["kind"]), []).append(m)
    assert out, "no containers rendered"
    for (cid, kind), ms in by_container.items():
        capped = ms[:3]
        vlist = [
            {
                "title": vid_meta[m["video_id"]]["title"],
                "url": vid_meta[m["video_id"]]["url"],
                "channel": vid_meta[m["video_id"]]["channel"],
                "doc": doc_map[m["video_id"]],
            }
            for m in capped
        ]
        expected = render_container(
            kind,
            f"https://www.youtube.com/{kind}/{cid}",
            vlist,
            style,
            vlist[0]["channel"] if vlist else "Unknown Channel",
        )
        assert out[cid] == expected, f"{cid} ({style})"
