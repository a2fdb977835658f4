"""Video/transcript pipeline — the reference's YouTube path re-expressed
as a star-schema DataFrame query (SURVEY.md §3 E3).

videos ⨝ transcripts ⨝ chapters ⨝ comments → per-video documents →
per-container folds. No loops: transcript assembly is an ordered
group fold, chapter organization is an anchor join (the as-of pattern
J2), comment ranking is a per-group top-k window (W1), container
assembly is a capped fold (L2 + A8).

The string renderers (D6, contxt/formatters/youtube_formatter.py:23-373
semantics) are pure Python functions applied once per video/container
through an Arrow-batched UDF; ``organize_transcript_by_chapters`` is
reimplemented faithfully including quirk Q12 (first chapter header
unconditional; non-timestamped lines never advance the cursor) and the
two distinct timestamp-strip variants (Q8).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------
# Pure-Python reference-semantics functions (the per-row oracle)
# ---------------------------------------------------------------------

_TS_LINE = re.compile(r"\[([\d\.]+)s\] (.*)")


def transcript_line(start: float | None, text: str) -> str:
    """S5 line format: '[{start:.1f}s] {text}'
    (contxt/youtube_handler.py:47); no-timestamp lines pass through."""
    if start is None:
        return text
    return f"[{start:.1f}s] {text}"


def organize_transcript_by_chapters(transcript: str, chapters: list[dict]) -> str:
    """J2/W6 with quirk Q12 (contxt/youtube_handler.py:72-113): cursor
    advances while t >= next chapter start; first header always
    emitted; non-timestamped lines (marker -1) never advance."""
    if not chapters or not transcript:
        return transcript
    lines = transcript.split("\n")
    parsed = []
    for line in lines:
        m = _TS_LINE.match(line)
        if m:
            parsed.append((float(m.group(1)), m.group(2)))
        else:
            parsed.append((-1.0, line))
    result = []
    cur = 0
    result.append(f"## {chapters[0]['title']}")
    for t, text in parsed:
        while cur < len(chapters) - 1 and t >= chapters[cur + 1]["start_time"]:
            cur += 1
            result.append(f"\n## {chapters[cur]['title']}")
        result.append(text)
    return "\n".join(result)


def strip_timestamps_raw(transcript: str) -> str:
    """Q8 variant A (find-']' + lstrip), youtube_formatter.py:62-72."""
    if not ("[" in transcript and "]" in transcript):
        return transcript
    out = []
    for line in transcript.split("\n"):
        if "[" in line and "]" in line:
            idx = line.find("]")
            if idx != -1 and idx + 1 < len(line):
                out.append(line[idx + 1:].lstrip())
            else:
                out.append(line)
        # NB: lines without brackets are dropped in this reference
        # variant (the else branch appends nothing) — faithful.
    return "\n".join(out)


def strip_timestamps_split(transcript: str) -> str:
    """Q8 variant B (split('] ', 1)), youtube_formatter.py:110-117."""
    out = []
    for line in transcript.split("\n"):
        if line.startswith("[") and "]" in line:
            out.append(line.split("] ", 1)[1] if "] " in line else line)
        else:
            out.append(line)
    return "\n".join(out)


def render_video_complete(
    title: str, channel: str, url: str, description: str,
    transcript: str, comments: list[tuple[str, str]], standalone: bool = True,
) -> str:
    """D6 complete renderer (youtube_formatter.py:127-211)."""
    h = "#" if standalone else "##"
    out = [f"{h} {title or 'Unknown Video'}",
           f"Channel: **{channel or 'Unknown'}**",
           f"URL: [{url}]({url})", ""]
    if description:
        out += [f"{h}# Description", description, ""]
    out.append(f"{h}# Transcript")
    if transcript:
        out += ["```", transcript, "```"]
    else:
        out.append("*No transcript available for this video.*")
    out.append("")
    if comments:
        out.append(f"{h}# Top Comments")
        cap = 10 if standalone else 5
        for author, text in comments[:cap]:
            out.append(f"**{author or 'Anonymous'}**: {text}")
            out.append("")
    return "\n".join(out)


def render_video_raw(title: str, channel: str, url: str, transcript_no_times: str) -> str:
    """D6 raw renderer (youtube_formatter.py:50-125)."""
    out = [f"Title: {title or 'Unknown Video'}",
           f"Channel: {channel or 'Unknown'}",
           f"URL: {url}", ""]
    if transcript_no_times:
        out += ["Transcript:", transcript_no_times]
    else:
        out.append("No transcript available for this video.")
    return "\n".join(out)


def render_video_chapters(
    title: str, channel: str, url: str, description: str,
    transcript: str, chapters: list[dict],
) -> str:
    """D6 chapters renderer (youtube_formatter.py:213-265)."""
    out = [f"# {title or 'Unknown Video'}",
           f"Channel: **{channel or 'Unknown'}**",
           f"URL: [{url}]({url})", ""]
    if description:
        out += ["## Description", description, ""]
    out.append("# Transcript")
    if chapters and transcript:
        out.append(organize_transcript_by_chapters(transcript, chapters))
    elif transcript:
        out += ["## Full Transcript", strip_timestamps_split(transcript)]
    else:
        out.append("*No transcript available for this video.*")
    out.append("")
    return "\n".join(out)


def render_container(
    kind: str, url: str, videos: list[dict], style: str, channel_name: str = ""
) -> str:
    """D6 playlist/channel assembly (youtube_formatter.py:272-373):
    numbered index list (md styles), per-video docs joined with '---'
    (md) or 40×'-' (raw), 'Video {i+1}:' prefixes in raw."""
    label = "Playlist" if kind == "playlist" else f"Channel: {channel_name}"
    head_txt = f"YouTube {label}"
    if not videos:
        if style == "raw":
            return f"{head_txt}\nURL: {url}\n\nNo videos found."
        return f"# {head_txt}\n\nURL: [{url}]({url})\n\n*No videos found.*"
    out = []
    if style == "raw":
        out += [head_txt, f"URL: {url}", f"Videos: {len(videos)}"]
    else:
        out += [f"# {head_txt}", f"URL: [{url}]({url})", f"Videos: {len(videos)}"]
    out.append("")
    if style != "raw":
        out.append("## Videos in this Playlist" if kind == "playlist" else "## Recent Videos")
        for i, v in enumerate(videos):
            out.append(f"{i + 1}. [{v.get('title', 'Unknown')}]({v.get('url', '#')})")
        out.append("")
    for i, v in enumerate(videos):
        if style == "raw":
            out.append(f"Video {i + 1}:")
        out.append(v["doc"])
        if i < len(videos) - 1:
            out.append("-" * 40 if style == "raw" else "---")
            out.append("")
    return "\n".join(out)


# ---------------------------------------------------------------------
# DataFrame pipeline
# ---------------------------------------------------------------------

def assemble_transcripts(transcripts: DataFrame, include_timestamps: bool = True) -> DataFrame:
    """S5: per-video ordered fold into the transcript string. One
    shuffle on video_id; ordering via array_sort on (pos, line) structs
    so it is partitioning-independent."""
    line = (
        F.when(F.col("start").isNotNull(),
               F.format_string("[%.1fs] %s", F.col("start"), F.col("text")))
        .otherwise(F.col("text"))
        if include_timestamps
        else F.col("text")
    )
    pair = F.struct(F.col("pos"), line.alias("line"))
    return (
        transcripts.select("video_id", pair.alias("p"))
        .groupBy("video_id")
        .agg(
            F.concat_ws(
                "\n", F.transform(F.array_sort(F.collect_list("p")), lambda s: s["line"])
            ).alias("transcript")
        )
    )


def organize_by_chapters_df(transcripts: DataFrame, chapters: DataFrame) -> DataFrame:
    """J2 relationally: chapter k≥1 anchors to the first transcript
    position with t >= start_time (min-pos aggregation on an
    inequality join restricted per video); chapter 0 anchors before
    everything. Headers and lines are unioned with a composite sort
    key and folded per video — no cursor loop, one shuffle on
    video_id, and the quirk-Q12 semantics drop out of the anchor
    definition (non-timestamped lines have t=-1, matching no chapter).

    Output: (video_id, organized) for videos that HAVE chapters.
    """
    lines = transcripts.select(
        "video_id",
        F.col("pos"),
        F.coalesce(F.col("start"), F.lit(-1.0)).alias("t"),
        F.col("text"),
    )
    ch = chapters.select("video_id", "k", "start_time", "title")

    # anchor position for k>=1: min pos whose t >= start_time.
    # Computed as a SUFFIX-MIN window over the time-interleaved union
    # of lines and chapter boundaries (ordered t DESC, lines before
    # chapters at equal t so the >= is inclusive): at each chapter row
    # the running min(pos) is exactly min{pos : t >= start_time}. The
    # r1–r6 shape joined every chapter against every same-video line
    # and aggregated — Θ(lines × chapters) join rows per video; the
    # union window is Θ(lines + chapters) through one exchange on
    # video_id (guide §2.4/§3.3 — the as-of join never multiplies).
    _lu = lines.select(
        "video_id", F.col("t"), F.lit(0).alias("_side"), "pos",
        F.lit(None).cast(ch.schema["k"].dataType).alias("k"),
        F.lit(None).cast("string").alias("title"),
    )
    _cu = ch.filter(F.col("k") >= 1).select(
        "video_id", F.col("start_time").alias("t"), F.lit(1).alias("_side"),
        F.lit(None).cast(lines.schema["pos"].dataType).alias("pos"),
        "k", "title",
    )
    w_sfx = (
        Window.partitionBy("video_id")
        .orderBy(F.col("t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anchors = (
        _lu.unionByName(_cu)
        .withColumn("anchor_pos", F.min("pos").over(w_sfx))
        .filter((F.col("_side") == 1) & F.col("anchor_pos").isNotNull())
        .select("video_id", "k", "title", "anchor_pos")
    )
    ch0 = ch.filter(F.col("k") == 0).select(
        "video_id", "k", "title", F.lit(-1).alias("anchor_pos")
    )
    headers = ch0.unionByName(anchors.select("video_id", "k", "title", "anchor_pos")).select(
        "video_id",
        F.struct(
            F.col("anchor_pos").alias("pos"),
            F.lit(0).alias("kind"),
            F.col("k").alias("sub"),
            F.when(F.col("k") == 0, F.concat(F.lit("## "), F.col("title")))
            .otherwise(F.concat(F.lit("\n## "), F.col("title")))
            .alias("line"),
        ).alias("p"),
    )
    # only videos that actually have chapters produce an organized
    # transcript (the reference returns the raw transcript otherwise,
    # contxt/youtube_handler.py:74-75)
    chaptered = ch.select("video_id").distinct()
    body = lines.join(F.broadcast(chaptered), "video_id", "left_semi").select(
        "video_id",
        F.struct(
            F.col("pos"), F.lit(1).alias("kind"), F.lit(0).alias("sub"),
            F.col("text").alias("line"),
        ).alias("p"),
    )
    return (
        headers.unionByName(body)
        .groupBy("video_id")
        .agg(
            F.concat_ws(
                "\n", F.transform(F.array_sort(F.collect_list("p")), lambda s: s["line"])
            ).alias("organized")
        )
    )


def top_comments(comments: DataFrame, k: int = 30) -> DataFrame:
    """W1: top-level comments ranked by likes (None→0) with a unique
    tie-break, capped at k per video (contxt/youtube_handler.py:144-156)."""
    w = Window.partitionBy("video_id").orderBy(
        F.desc(F.coalesce(F.col("like_count"), F.lit(0))), F.asc("comment_id")
    )
    return (
        comments.filter(F.col("parent") == "root")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


_DOC_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("doc", T.StringType()),
])


def video_documents(
    videos: DataFrame,
    transcripts: DataFrame,
    chapters: DataFrame,
    comments: DataFrame,
    style: str = "complete",
    standalone: bool = True,
) -> DataFrame:
    """The star join → one document per video.

    All heavy lifting (folds, rankings, as-of organization) happens in
    DataFrame land; the final string rendering crosses to Python once
    per video via an Arrow batch."""
    t_with = assemble_transcripts(transcripts, include_timestamps=True)
    t_without = assemble_transcripts(transcripts, include_timestamps=False).withColumnRenamed(
        "transcript", "transcript_no_times"
    )
    ranked = top_comments(comments, 30)
    c_list = (
        ranked.select(
            "video_id",
            F.struct("rank", "author", "text").alias("c"),
        )
        .groupBy("video_id")
        .agg(F.array_sort(F.collect_list("c")).alias("comments"))
    )
    ch_list = (
        chapters.select("video_id", F.struct("k", "start_time", "title").alias("ch"))
        .groupBy("video_id")
        .agg(F.array_sort(F.collect_list("ch")).alias("chapters"))
    )
    organized = organize_by_chapters_df(transcripts, chapters)

    joined = (
        videos.join(t_with, "video_id", "left")
        .join(t_without, "video_id", "left")
        .join(c_list, "video_id", "left")
        .join(ch_list, "video_id", "left")
        .join(organized, "video_id", "left")
    )

    # All three styles render as pure Column expressions — the whole
    # star-join → document assembly stays inside whole-stage codegen,
    # zero Python per row (the Python renderers above remain the
    # per-row oracles for the byte-parity tests).
    if style == "raw":
        expr = render_raw_expr()
    elif style == "chapters":
        expr = render_chapters_expr()
    else:
        expr = render_complete_expr(standalone)
    return joined.select("video_id", expr.alias("doc"))


def container_documents(
    containers: DataFrame,
    videos: DataFrame,
    video_docs: DataFrame,
    style: str = "complete",
    max_videos: int = 30,
) -> DataFrame:
    """S7/L2/A8: per-container capped ordered fold of member video
    documents into one playlist/channel document."""
    w = Window.partitionBy("container_id").orderBy("position", "video_id")
    members = (
        containers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_videos)
        .join(videos.select("video_id", "title", "channel", "url"), "video_id")
        .join(video_docs, "video_id")
    )
    packed = members.select(
        "container_id", "kind",
        F.struct("position", "video_id", "title", "channel", "url", "doc").alias("m"),
    ).groupBy("container_id", "kind").agg(
        F.array_sort(F.collect_list("m")).alias("members")
    )

    # container assembly is a pure Column expression too (zero Python
    # per row); render_container stays as the per-row parity oracle.
    return packed.select(
        F.col("container_id"),
        render_container_expr(style).alias("doc"),
    )


def render_container_expr(style: str) -> "F.Column":
    """D6 playlist/channel assembly as a pure Column expression —
    semantically identical to :func:`render_container` for non-empty
    member lists (empty containers never reach this operator: the
    member join drops them; the Python oracle keeps the empty branch
    for the reference's single-video CLI path).

    Expects columns: container_id, kind, members
    (array<struct<position, video_id, title, channel, url, doc>>
    sorted by position)."""
    members = F.col("members")
    n = F.size(members)
    url = F.concat(
        F.lit("https://www.youtube.com/"), F.col("kind"), F.lit("/"),
        F.col("container_id"),
    )
    channel_name = F.element_at(members, 1)["channel"]
    label = F.when(F.col("kind") == "playlist", F.lit("Playlist")).otherwise(
        F.concat(F.lit("Channel: "), channel_name)
    )
    head_txt = F.concat(F.lit("YouTube "), label)
    if style == "raw":
        head = F.array(
            head_txt,
            F.concat(F.lit("URL: "), url),
            F.concat(F.lit("Videos: "), n.cast("string")),
            F.lit(""),
        )
        index_block = F.array().cast("array<string>")
    else:
        head = F.array(
            F.concat(F.lit("# "), head_txt),
            F.concat(F.lit("URL: ["), url, F.lit("]("), url, F.lit(")")),
            F.concat(F.lit("Videos: "), n.cast("string")),
            F.lit(""),
        )
        index_header = F.when(
            F.col("kind") == "playlist", F.lit("## Videos in this Playlist")
        ).otherwise(F.lit("## Recent Videos"))
        # binary lambda = (element, index) — the arity is semantic
        index_lines = F.transform(
            members,
            lambda m, i: F.concat(
                (i + 1).cast("string"),
                F.lit(". ["),
                F.coalesce(m["title"], F.lit("Unknown")),
                F.lit("]("),
                F.coalesce(m["url"], F.lit("#")),
                F.lit(")"),
            ),
        )
        index_block = F.concat(
            F.array(index_header), index_lines, F.array(F.lit(""))
        )
    sep = "-" * 40 if style == "raw" else "---"
    doc_lines = F.flatten(
        F.transform(
            members,
            lambda m, i: F.concat(
                F.array(F.concat(F.lit("Video "), (i + 1).cast("string"), F.lit(":")))
                if style == "raw"
                else F.array().cast("array<string>"),
                F.array(m["doc"]),
                F.when(i < n - 1, F.array(F.lit(sep), F.lit(""))).otherwise(
                    F.array().cast("array<string>")
                ),
            ),
        )
    )
    return F.concat_ws("\n", F.concat(head, index_block, doc_lines))


def render_complete_expr(standalone: bool = True) -> "F.Column":
    """D6 'complete' renderer as a pure Column expression — zero
    Python per row. Semantically identical to
    :func:`render_video_complete` (parity-tested); this is the 100 TB
    path: the whole videos⨝transcripts⨝comments document assembly
    stays inside whole-stage codegen.

    Expects columns: title, channel, url, description, transcript,
    comments (array<struct<rank,author,text>> sorted by rank, or null).
    """
    h = "#" if standalone else "##"
    cap = 10 if standalone else 5

    title = F.when(
        F.col("title").isNotNull() & (F.col("title") != ""), F.col("title")
    ).otherwise(F.lit("Unknown Video"))
    channel = F.when(
        F.col("channel").isNotNull() & (F.col("channel") != ""), F.col("channel")
    ).otherwise(F.lit("Unknown"))

    head = F.array(
        F.concat(F.lit(f"{h} "), title),
        F.concat(F.lit("Channel: **"), channel, F.lit("**")),
        F.concat(F.lit("URL: ["), F.col("url"), F.lit("]("), F.col("url"), F.lit(")")),
        F.lit(""),
    )
    desc_block = F.when(
        F.col("description").isNotNull() & (F.col("description") != ""),
        F.array(F.lit(f"{h}# Description"), F.col("description"), F.lit("")),
    ).otherwise(F.array().cast("array<string>"))
    transcript_block = F.when(
        F.col("transcript").isNotNull() & (F.col("transcript") != ""),
        F.array(F.lit(f"{h}# Transcript"), F.lit("```"), F.col("transcript"), F.lit("```"), F.lit("")),
    ).otherwise(
        F.array(F.lit(f"{h}# Transcript"), F.lit("*No transcript available for this video.*"), F.lit(""))
    )
    comments_lines = F.flatten(
        F.transform(
            F.slice(F.coalesce(F.col("comments"), F.array().cast(
                "array<struct<rank:int,author:string,text:string>>")), 1, cap),
            lambda c: F.array(
                F.concat(
                    F.lit("**"),
                    F.when(c["author"].isNotNull() & (c["author"] != ""), c["author"]).otherwise(F.lit("Anonymous")),
                    F.lit("**: "),
                    c["text"],
                ),
                F.lit(""),
            ),
        )
    )
    comments_block = F.when(
        F.size(F.coalesce(F.col("comments"), F.array().cast(
            "array<struct<rank:int,author:string,text:string>>"))) > 0,
        F.concat(F.array(F.lit(f"{h}# Top Comments")), comments_lines),
    ).otherwise(F.array().cast("array<string>"))

    all_lines = F.concat(head, desc_block, transcript_block, comments_block)
    return F.concat_ws("\n", all_lines)


def strip_timestamps_raw_expr(t: "F.Column") -> "F.Column":
    """Column twin of :func:`strip_timestamps_raw` (Q8 variant A):
    lines containing both brackets keep the text after the first ']'
    (lstripped); bracket-less lines are DROPPED (faithful quirk); a
    transcript with no brackets at all passes through unchanged."""
    lines = F.split(t, "\n")
    kept = F.filter(lines, lambda l: l.contains("[") & l.contains("]"))
    mapped = F.transform(
        kept,
        lambda l: F.when(
            F.instr(l, "]") < F.length(l),
            F.regexp_replace(F.substr(l, F.instr(l, "]") + 1), r"^\s+", ""),
        ).otherwise(l),
    )
    return F.when(
        t.contains("[") & t.contains("]"), F.concat_ws("\n", mapped)
    ).otherwise(t)


def strip_timestamps_split_expr(t: "F.Column") -> "F.Column":
    """Column twin of :func:`strip_timestamps_split` (Q8 variant B):
    lines starting with '[' take the text after the first '] '
    (kept whole when there is no '] '); other lines pass through."""
    lines = F.split(t, "\n")
    mapped = F.transform(
        lines,
        lambda l: F.when(
            l.startswith("[") & l.contains("] "),
            F.regexp_replace(l, r"^.*?\] ", ""),
        ).otherwise(l),
    )
    return F.concat_ws("\n", mapped)


def render_raw_expr() -> "F.Column":
    """D6 'raw' renderer as a pure Column expression — semantically
    identical to :func:`render_video_raw` incl. the
    transcript_no_times → strip(transcript) fallback (parity-tested).

    Expects columns: title, channel, url, transcript,
    transcript_no_times."""
    tnt = F.when(
        F.col("transcript_no_times").isNotNull() & (F.col("transcript_no_times") != ""),
        F.col("transcript_no_times"),
    ).otherwise(
        F.when(
            F.col("transcript").isNotNull() & (F.col("transcript") != ""),
            strip_timestamps_raw_expr(F.col("transcript")),
        ).otherwise(F.lit(""))
    )
    title = F.when(
        F.col("title").isNotNull() & (F.col("title") != ""), F.col("title")
    ).otherwise(F.lit("Unknown Video"))
    channel = F.when(
        F.col("channel").isNotNull() & (F.col("channel") != ""), F.col("channel")
    ).otherwise(F.lit("Unknown"))
    head = F.array(
        F.concat(F.lit("Title: "), title),
        F.concat(F.lit("Channel: "), channel),
        F.concat(F.lit("URL: "), F.col("url")),
        F.lit(""),
    )
    tail = F.when(
        tnt != "", F.array(F.lit("Transcript:"), tnt)
    ).otherwise(F.array(F.lit("No transcript available for this video.")))
    return F.concat_ws("\n", F.concat(head, tail))


def render_chapters_expr() -> "F.Column":
    """D6 'chapters' renderer as a pure Column expression —
    semantically identical to :func:`render_video_chapters` with the
    chapter organization taken from the already-computed ``organized``
    column (organize_by_chapters_df; byte-parity with the Python
    cursor loop is covered by the Q12 tests).

    Expects columns: title, channel, url, description, transcript,
    chapters (array, may be null), organized (string, null for
    chapter-less videos)."""
    title = F.when(
        F.col("title").isNotNull() & (F.col("title") != ""), F.col("title")
    ).otherwise(F.lit("Unknown Video"))
    channel = F.when(
        F.col("channel").isNotNull() & (F.col("channel") != ""), F.col("channel")
    ).otherwise(F.lit("Unknown"))
    head = F.array(
        F.concat(F.lit("# "), title),
        F.concat(F.lit("Channel: **"), channel, F.lit("**")),
        F.concat(F.lit("URL: ["), F.col("url"), F.lit("]("), F.col("url"), F.lit(")")),
        F.lit(""),
    )
    desc_block = F.when(
        F.col("description").isNotNull() & (F.col("description") != ""),
        F.array(F.lit("## Description"), F.col("description"), F.lit("")),
    ).otherwise(F.array().cast("array<string>"))
    has_transcript = F.col("transcript").isNotNull() & (F.col("transcript") != "")
    has_chapters = F.col("chapters").isNotNull() & (F.size(F.col("chapters")) > 0)
    body = (
        F.when(has_chapters & has_transcript, F.array(F.col("organized")))
        .when(
            has_transcript,
            F.array(
                F.lit("## Full Transcript"),
                strip_timestamps_split_expr(F.col("transcript")),
            ),
        )
        .otherwise(F.array(F.lit("*No transcript available for this video.*")))
    )
    all_lines = F.concat(
        head, desc_block, F.array(F.lit("# Transcript")), body, F.array(F.lit(""))
    )
    return F.concat_ws("\n", all_lines)
