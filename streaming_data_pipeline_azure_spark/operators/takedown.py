"""Unified document takedown across every persisted surface.

The reference's serving sink supports per-document deletes (Cosmos DB
keyed container — reference README.md:107-129); this repo extends the
same takedown contract to every index a document's content leaks into
(MinHash shingles, postings, IVF / IVF-PQ codes). A GDPR/DMCA request
is "forget doc X EVERYWHERE", not "delete it from one table" — and
forgetting half the surfaces is worse than forgetting none, because
the remaining index entries still reconstruct membership.

:func:`forget_documents` is the one-call coordinator: it fans the id
set out to each registered component's own ``delete`` (all of which
are logical-immediate via the shared :class:`TombstoneSet` — the ids
stop matching every probe/search/read at once — and physical at each
component's next ``compact()``), and returns a per-surface report so
callers can audit what was actually covered.

Deliberate non-member: :class:`~...corpus.GramCorpusIndex`. Its
payload is a doc-id-FREE set of 8-byte gram hashes (membership only —
that anonymity is what makes its probe a broadcast semi-join), so
per-document deletion is structurally impossible without re-ingesting
the surviving corpus; the report lists it as ``unsupported`` when
passed so the gap is explicit rather than silent.
"""

from __future__ import annotations

from collections.abc import Iterable


def forget_documents(
    spark,
    ids: Iterable,
    *,
    sink=None,
    indexes: dict | None = None,
    compact: bool = False,
) -> dict:
    """Delete ``ids`` from every given surface; returns
    ``{surface_name: "deleted" | "deleted+compacted" | "unsupported"}``.

    ``sink`` is a :class:`ParquetUpsertSink` (keys deleted as of the
    current batch horizon — a LATER write_batch still resurrects, which
    is the correct ordered-delete semantics for replayed pipelines).
    ``indexes`` maps a display name to any object with a
    ``delete(spark, ids)`` method (MinHashCorpusIndex, IvfIndex,
    IvfPqIndex, PostingsIndex). ``compact=True`` additionally runs each
    surface's ``compact()`` so the bytes are gone physically, not just
    hidden (the expensive step — schedule it, don't block a request
    handler on it).
    """
    ids = list(ids)
    report: dict[str, str] = {}
    if sink is not None:
        sink.delete_keys(spark, ids)
        if compact:
            sink.compact(spark)
        report["sink"] = "deleted+compacted" if compact else "deleted"
    for name, idx in (indexes or {}).items():
        if not hasattr(idx, "delete"):
            report[name] = "unsupported"
            continue
        idx.delete(spark, ids)
        if compact and hasattr(idx, "compact"):
            idx.compact(spark)
            report[name] = "deleted+compacted"
        else:
            report[name] = "deleted"
    return report
