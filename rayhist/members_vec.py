"""Vectorized compound-document engine (way/relation member recursion).

Drop-in fast path for rayhist.members.contribution_stats_batch /
snapshot_geoms_batch: the span parse is ONE batch-level pass of Arrow
regex kernels (no ``to_pylist``, no per-span Python string splits), and
the per-document temporal logic runs on numpy arrays — member-version
resolution is a searchsorted per (doc, child) instead of a linear scan
per (timestamp, member).

Semantics mirror rayhist.members (the per-document reference
implementation, kept for arbitrary ``match`` callables and as the A/B
oracle in tests) which itself mirrors the reference:

- recursive modification timestamps: ``OSHEntities.java:330-478``
- changeset collapse w/ parent putIfAbsent precedence: ``:122-170``
- member geometry resolution: ``OSHDBGeometryBuilder.java:72-110``
- contribution classification: ``CellIterator.java:437-712``
- child-attributed contributor uid: ``OSMContribution.java:211-257``

Exact-mirror notes (each pinned by tests/test_members_vec.py A/B):

- tag dicts compare equal iff their canonical signatures (dedup
  keep-LAST per key, sort by key, join "k=v" with "\x1f" — values may
  contain ';') compare equal;
- the changeset map takes the LAST parent version per timestamp, then
  children in FIRST-APPEARANCE (span) order, first (ts,v) per child;
- member-validity windows need no merging for the membership test:
  per child, window los AND his are both ascending (hi = next parent
  version ts >= own ts), so "last window with lo <= t" is exact;
- uid attribution scans the state's DIRECT members in order, the last
  member having a version at exactly ts wins, first (ts,v) within it;
- a resolved member version with member spans recurses (way inside a
  relation); leaf-ness for coords is per RESOLVED VERSION, leaf-ness
  for modification recursion is per CHILD (any version has members).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

INF = 1 << 62

_VER_CHILD_RE = (
    r"^child=(?P<child>[^;]+);v=(?P<v>-?\d+);ts=(?P<ts>-?\d+);"
    r"cs=(?P<cs>-?\d+);uid=(?P<uid>-?\d+);vis=(?P<vis>[01])$"
)
_VER_PLAIN_RE = (
    r"^v=(?P<v>-?\d+);ts=(?P<ts>-?\d+);"
    r"cs=(?P<cs>-?\d+);uid=(?P<uid>-?\d+);vis=(?P<vis>[01])$"
)
_GEOM_RE = r"v=(?P<v>-?\d+);lon=(?P<lon>-?\d+);lat=(?P<lat>-?\d+)$"
_MEM_RE = r"^(?P<ent>.*?)@role=(?P<role>.*)$"  # non-greedy: split on the FIRST @role= (parse_doc parity)
_TAG_RE = r"^(?P<k>[^=]*)=(?P<v>.*)$"


def _range_gather_idx(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices that concatenate values[starts[i] : starts[i]+counts[i]]."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    prefix = np.cumsum(counts) - counts
    return np.repeat(starts - prefix, counts) + np.arange(total, dtype=np.int64)


def _i64(struct_arr, name: str) -> np.ndarray:
    return pc.cast(pc.struct_field(struct_arr, name), pa.int64()).to_numpy(
        zero_copy_only=False
    )



def _shift1(a, fill):
    """[fill, a[0], ..., a[-2]] without np.r_ overhead."""
    out = np.empty(len(a), dtype=a.dtype)
    out[0] = fill
    out[1:] = a[:-1]
    return out


def _group_bounds(sorted_codes: np.ndarray) -> np.ndarray:
    """Segment boundaries [0, ..., n] of equal-value runs."""
    n = len(sorted_codes)
    cuts = np.flatnonzero(sorted_codes[1:] != sorted_codes[:-1]) + 1
    out = np.empty(len(cuts) + 2, dtype=np.int64)
    out[0] = 0
    out[1:-1] = cuts
    out[-1] = n
    return out


class ParsedBatch:
    """Struct-of-arrays view of one batch of compound span documents.

    Version records are kept in two orders: span order (member/tag/geom
    attachment) and entity order (``order2`` = sorted by
    (doc, child, ts, v)) used by every temporal kernel. ``*2`` arrays
    are in entity order; ``mem_*`` index the flat member-edge arrays.
    """

    def __init__(self, batch: pa.Table, match_kv=None):
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lengths = pc.list_value_length(spans).to_numpy().astype(np.int64)
        self.ndocs = len(lengths)
        flat = spans.flatten()
        doc_of = np.repeat(np.arange(self.ndocs, dtype=np.int64), lengths)
        off = flat.field("offset").to_numpy().astype(np.int64)
        order = np.lexsort((off, doc_of))
        if not np.array_equal(order, np.arange(len(order))):
            flat = flat.take(pa.array(order))
            doc_of = doc_of[order]

        kinds = flat.field("kind")
        text = flat.field("text")
        ref = flat.field("media_ref")
        is_ver = pc.equal(kinds, "version").to_numpy(zero_copy_only=False)
        is_tag = pc.equal(kinds, "tag").to_numpy(zero_copy_only=False)
        is_mem = pc.equal(kinds, "member").to_numpy(zero_copy_only=False)
        is_geo = pc.equal(kinds, "geom").to_numpy(zero_copy_only=False)
        # attachment pointer: each non-version span belongs to the most
        # recent preceding version span (parse_doc's `cur`)
        ver_ptr = np.cumsum(is_ver) - 1
        ver_pos = np.flatnonzero(is_ver)
        nver = len(ver_pos)
        self.nver = nver
        ver_doc = doc_of[ver_pos]

        # ---- version parse (split by child= prefix, fixed regexes)
        vtext = text.filter(pa.array(is_ver))
        has_child = pc.starts_with(vtext, "child=").to_numpy(zero_copy_only=False)
        v = np.empty(nver, np.int64)
        ts = np.empty(nver, np.int64)
        cs = np.empty(nver, np.int64)
        uid = np.empty(nver, np.int64)
        vis = np.empty(nver, bool)
        child_str = np.full(nver, None, dtype=object)
        if (~has_child).any():
            # plain versions share the node-table fixed layout: use the
            # split+slice fast parse (model._parse_fixed, ~2x vs regex)
            from .model import _VERSION_FIELDS, _parse_fixed

            mask = ~has_child
            f = _parse_fixed(vtext.filter(pa.array(mask)), _VERSION_FIELDS, _VER_PLAIN_RE)
            if any(arr.dtype.kind != "i" for arr in f.values()):
                # regex fallback surfaces malformed spans as nulls
                # (float NaN after to_numpy) — keep the loud error
                raise ValueError("unparseable version span in compound document")
            v[mask] = f["v"]
            ts[mask] = f["ts"]
            cs[mask] = f["cs"]
            uid[mask] = f["uid"]
            vis[mask] = f["vis"] == 1
        if has_child.any():
            # child-version spans ('child=X;v=...') DOMINATE compound
            # docs (denormalized child histories) — same fast parse,
            # with the child id sliced as a string
            sub = vtext.filter(pa.array(has_child))
            lists = pc.split_pattern(sub, ";")
            n_parts = pc.sum(pc.list_value_length(lists)).as_py() or 0
            f6 = child = None
            if n_parts == 6 * len(sub):
                try:
                    parsed = {}
                    for i, (name, prefix) in enumerate(
                        [("v", "v="), ("ts", "ts="), ("cs", "cs="),
                         ("uid", "uid="), ("vis", "vis=")]
                    ):
                        elem = pc.list_element(lists, i + 1)
                        if not pc.all(pc.starts_with(elem, prefix)).as_py():
                            parsed = None
                            break
                        parsed[name] = (
                            pc.utf8_slice_codeunits(elem, len(prefix))
                            .cast(pa.int64())
                            .to_numpy(zero_copy_only=False)
                        )
                    if parsed is not None:
                        f6 = parsed
                        child = pc.utf8_slice_codeunits(
                            pc.list_element(lists, 0), 6  # 'child='
                        ).to_numpy(zero_copy_only=False)
                except pa.ArrowInvalid:
                    f6 = child = None
            if f6 is None:
                ex = pc.extract_regex(sub, _VER_CHILD_RE)
                if ex.null_count:
                    raise ValueError("unparseable version span in compound document")
                f6 = {n: _i64(ex, n) for n in ("v", "ts", "cs", "uid", "vis")}
                child = pc.struct_field(ex, "child").to_numpy(zero_copy_only=False)
            v[has_child] = f6["v"]
            ts[has_child] = f6["ts"]
            cs[has_child] = f6["cs"]
            uid[has_child] = f6["uid"]
            vis[has_child] = f6["vis"] == 1
            child_str[has_child] = child

        # ---- geom spans -> lon/lat scattered onto their version record
        lon = np.zeros(nver, np.int64)
        lat = np.zeros(nver, np.int64)
        geo_pos = np.flatnonzero(is_geo)
        if len(geo_pos):
            gref = ref.filter(pa.array(is_geo))
            ex = pc.extract_regex(gref, _GEOM_RE)
            if ex.null_count:
                raise ValueError("unparseable geom span in compound document")
            tgt = ver_ptr[geo_pos]
            okg = (tgt >= 0) & (ver_doc[np.maximum(tgt, 0)] == doc_of[geo_pos])
            lon[tgt[okg]] = _i64(ex, "lon")[okg]
            lat[tgt[okg]] = _i64(ex, "lat")[okg]

        # ---- member spans (flat edge arrays, span order)
        mem_pos = np.flatnonzero(is_mem)
        if len(mem_pos):
            mtext = text.filter(pa.array(is_mem))
            ex = pc.extract_regex(mtext, _MEM_RE)
            if ex.null_count:
                raise ValueError("unparseable member span in compound document")
            mem_ent = pc.struct_field(ex, "ent").to_numpy(zero_copy_only=False)
            mem_role = pc.struct_field(ex, "role").to_numpy(zero_copy_only=False)
            mem_vidx = ver_ptr[mem_pos]
            okm = (mem_vidx >= 0) & (
                ver_doc[np.maximum(mem_vidx, 0)] == doc_of[mem_pos]
            )
            mem_ent, mem_vidx = mem_ent[okm], mem_vidx[okm]
            self.mem_role = mem_role[okm]
        else:
            mem_ent = np.empty(0, dtype=object)
            mem_vidx = np.empty(0, dtype=np.int64)
            self.mem_role = np.empty(0, dtype=object)

        # ---- child codes (batch-global factorization of id strings)
        child_mask = np.asarray([c is not None for c in child_str], dtype=bool)
        all_strs = np.concatenate([child_str[child_mask], mem_ent])
        if len(all_strs):
            codes, _ = pd.factorize(all_strs)
        else:
            codes = np.empty(0, np.int64)
        ncod = len(child_str[child_mask])
        ver_child = np.full(nver, -1, np.int64)
        ver_child[child_mask] = codes[:ncod]
        self.mem_child = codes[ncod:].astype(np.int64)
        C = int(codes.max()) + 1 if len(codes) else 0

        # per-version member slices (mem_vidx is non-decreasing)
        self.mem_start = np.searchsorted(mem_vidx, np.arange(nver), side="left")
        self.mem_end = np.searchsorted(mem_vidx, np.arange(nver), side="right")

        # ---- tag signatures (dedup keep-last per key, sorted join)
        tag_pos = np.flatnonzero(is_tag)
        sig = np.full(nver, "", dtype=object)
        self.match = np.ones(nver, bool)
        # per-version old-style-multipolygon TAG side (BaseTagInterpreter
        # .isOldStyleMultipolygon:111-136): every tag is a relation-area
        # tag or uninteresting; tagless versions pass vacuously
        oldstyle = np.ones(nver, bool)
        if len(tag_pos):
            ttext = text.filter(pa.array(is_tag))
            ex = pc.extract_regex(ttext, _TAG_RE)
            if ex.null_count:
                raise ValueError("unparseable tag span in compound document")
            tdf = pd.DataFrame(
                {
                    "vidx": ver_ptr[tag_pos],
                    "k": pc.struct_field(ex, "k").to_numpy(zero_copy_only=False),
                    "v": pc.struct_field(ex, "v").to_numpy(zero_copy_only=False),
                }
            )
            tdf = tdf[
                (tdf["vidx"].to_numpy() >= 0)
                & (ver_doc[np.maximum(tdf["vidx"].to_numpy(), 0)] == doc_of[tag_pos])
            ]
            tdf = tdf.drop_duplicates(["vidx", "k"], keep="last").sort_values(
                ["vidx", "k"], kind="mergesort"
            )
            kv = tdf["k"].to_numpy(dtype=object) + "=" + tdf["v"].to_numpy(dtype=object)
            from .members import RELATION_AREA_TAGS, UNINTERESTING_TAG_KEYS

            areaset = {f"{k}={v}" for k, v in RELATION_AREA_TAGS}
            bad = ~(
                pd.Series(kv).isin(areaset).to_numpy()
                | tdf["k"].isin(UNINTERESTING_TAG_KEYS).to_numpy()
            )
            if bad.any():
                badv = np.bincount(
                    tdf["vidx"].to_numpy()[bad], minlength=nver
                ) > 0
                oldstyle = ~badv
            # join with \x1f (unit separator): tag VALUES may contain
            # ';'/'=' and a ';' join would collide distinct tag dicts
            # ({'a':'1;b=2'} vs {'a':'1','b':'2'}) — keys cannot contain
            # '=' (parse regex), so k=v + \x1f is unambiguous
            joined = (
                pd.Series(kv).groupby(tdf["vidx"].to_numpy()).agg("\x1f".join)
            )
            sig[joined.index.to_numpy()] = joined.to_numpy(dtype=object)
            if match_kv is not None:
                mk, mv = match_kv
                hit = tdf[(tdf["k"] == mk) & (tdf["v"] == mv)]["vidx"].to_numpy()
                self.match = np.zeros(nver, bool)
                self.match[hit] = True
        elif match_kv is not None:
            self.match = np.zeros(nver, bool)
        sig_codes, _ = pd.factorize(sig)

        # ---- entity order: (doc, child) with parent (-1) first per doc
        key = ver_doc * (C + 2) + (ver_child + 1)
        uniq_keys, ent_of_ver = np.unique(key, return_inverse=True)
        nents = len(uniq_keys)
        self.nents = nents
        self.ent_doc = (uniq_keys // (C + 2)).astype(np.int64)
        self.ent_child = (uniq_keys % (C + 2) - 1).astype(np.int64)
        order2 = np.lexsort((v, ts, ent_of_ver))
        self.ts2 = ts[order2]
        self.v2 = v[order2]
        self.cs2 = cs[order2]
        self.uid2 = uid[order2]
        self.vis2 = vis[order2]
        self.lon2 = lon[order2]
        self.lat2 = lat[order2]
        self.sig2 = sig_codes[order2]
        self.match2 = self.match[order2]
        self.oldstyle2 = oldstyle[order2]
        self.mem_start2 = self.mem_start[order2]
        self.mem_end2 = self.mem_end[order2]
        eov_sorted = ent_of_ver[order2]
        self.ent_start = np.searchsorted(
            eov_sorted, np.arange(nents + 1), side="left"
        )
        # first-appearance span position per entity (cs-map child order)
        self.ent_app = np.minimum.reduceat(ver_pos[order2], self.ent_start[:-1])
        # modification-recursion leaf rule: per CHILD, any version has members
        hasm = (self.mem_end2 - self.mem_start2) > 0
        self.ent_has_mem = np.maximum.reduceat(
            hasm.astype(np.int8), self.ent_start[:-1]
        ).astype(bool)
        # doc -> entity ranges
        self.doc_ent_start = np.searchsorted(
            self.ent_doc, np.arange(self.ndocs + 1), side="left"
        )

    # ------------------------------------------------------------- helpers
    def child_ents(self, d: int) -> dict[int, int]:
        """{child code: entity id} for doc d (parent entity excluded)."""
        a, b = self.doc_ent_start[d], self.doc_ent_start[d + 1]
        return {
            int(self.ent_child[e]): e
            for e in range(a, b)
            if self.ent_child[e] != -1
        }

    def parent_ent(self, d: int) -> int | None:
        a, b = self.doc_ent_start[d], self.doc_ent_start[d + 1]
        if a < b and self.ent_child[a] == -1:
            return int(a)
        return None


def _mod_ts_entity(P: ParsedBatch, ent: int, cmap: dict, use_match: bool, memo: dict):
    """Recursive modification timestamps for one entity — the vectorized
    ``members._recursive_mod_ts`` (OSHEntities.java:330-478). Returns a
    sorted array (possibly with duplicates; caller uniques)."""
    mkey = (ent, use_match)
    if mkey in memo:
        return memo[mkey]
    s, t = P.ent_start[ent], P.ent_start[ent + 1]
    vis = P.vis2[s:t]
    m = vis & P.match2[s:t] if use_match else vis.copy()
    ts = P.ts2[s:t]
    parts = [ts[m | _shift1(m, False)]]
    mi = np.flatnonzero(m)
    if mi.size:
        counts = (P.mem_end2[s:t] - P.mem_start2[s:t])[mi]
        if counts.sum():
            next_ts = np.empty(len(ts), np.int64)
            next_ts[:-1] = ts[1:]
            next_ts[-1] = INF
            next_ts = next_ts[mi]
            lo = np.repeat(ts[mi], counts)
            hi = np.repeat(next_ts, counts)
            gidx = _range_gather_idx(P.mem_start2[s:t][mi], counts)
            ch = P.mem_child[gidx]
            o = np.argsort(ch, kind="stable")
            ch, lo, hi = ch[o], lo[o], hi[o]
            bounds = _group_bounds(ch)
            for bi in range(len(bounds) - 1):
                a, b = bounds[bi], bounds[bi + 1]
                ce = cmap.get(int(ch[a]))
                if ce is None:
                    continue
                if P.ent_has_mem[ce]:
                    cts = _mod_ts_entity(P, ce, cmap, False, memo)
                else:
                    cts = P.ts2[P.ent_start[ce] : P.ent_start[ce + 1]]
                j = np.searchsorted(lo[a:b], cts, side="right") - 1
                ok = j >= 0
                ok[ok] &= cts[ok] <= hi[a:b][j[ok]]
                parts.append(cts[ok])
    res = np.unique(np.concatenate(parts)) if len(parts) > 1 else np.unique(parts[0])
    memo[mkey] = res
    return res


def _collapsed_mod_ts(P: ParsedBatch, d: int, pe: int, cmap: dict, memo: dict):
    """Doc-level modification timestamps: recursion + changeset collapse
    (parents win per ts, then children in first-appearance order)."""
    mts = _mod_ts_entity(P, pe, cmap, True, memo)
    if len(mts) <= 1:
        return mts
    s, t = P.ent_start[pe], P.ent_start[pe + 1]
    pts = P.ts2[s:t]
    u_p, cnt_p = np.unique(pts, return_counts=True)
    pcs = P.cs2[s:t][np.cumsum(cnt_p) - 1]  # LAST version per ts wins
    ents = sorted(cmap.values(), key=lambda e: P.ent_app[e])
    if ents:
        cts_all = np.concatenate(
            [P.ts2[P.ent_start[e] : P.ent_start[e + 1]] for e in ents]
        )
        ccs_all = np.concatenate(
            [P.cs2[P.ent_start[e] : P.ent_start[e + 1]] for e in ents]
        )
        u_c, i_c = np.unique(cts_all, return_index=True)  # FIRST occurrence
        ccs = ccs_all[i_c]
    else:
        u_c = np.empty(0, np.int64)
        ccs = np.empty(0, np.int64)

    j = np.searchsorted(u_p, mts)
    is_p = (j < len(u_p)) & (u_p[np.minimum(j, len(u_p) - 1)] == mts)
    cs_at = np.empty(len(mts), np.int64)
    cs_at[is_p] = pcs[j[is_p]]
    rest = ~is_p
    if rest.any():
        k = np.searchsorted(u_c, mts[rest])
        hit = (k < len(u_c)) & (u_c[np.minimum(k, len(u_c) - 1)] == mts[rest])
        vals = np.full(rest.sum(), -(1 << 61), np.int64)  # cs_map.get -> None
        vals[hit] = ccs[k[hit]]
        cs_at[rest] = vals
    keep = np.empty(len(cs_at), bool)
    keep[:-1] = cs_at[:-1] != cs_at[1:]
    keep[-1] = True
    return mts[keep]


def _resolve_coords_rows(P: ParsedBatch, cmap: dict, row_ts, gk):
    """Member-resolved coordinates for rows (row_ts[i], state version
    gk[i] in entity order). Returns (counts per row, lon_flat, lat_flat)
    ordered by (row, member position, sub position...) — the exact
    sequence members.resolve_coords builds (invisible/missing skipped,
    way members expanded in place, leaf-ness per resolved version)."""
    nrows = len(row_ts)
    counts1 = P.mem_end2[gk] - P.mem_start2[gk]
    rows = np.repeat(np.arange(nrows, dtype=np.int64), counts1)
    tcol = np.repeat(row_ts, counts1)
    gidx = _range_gather_idx(P.mem_start2[gk], counts1)
    ch = P.mem_child[gidx]
    prefix = np.cumsum(counts1) - counts1
    pos1 = np.arange(len(rows), dtype=np.int64) - np.repeat(prefix, counts1)
    return _resolve_frontier(P, cmap, nrows, (rows, tcol, ch, [pos1]))


def _resolve_frontier(P: ParsedBatch, cmap: dict, nrows: int, frontier):
    """Shared member-recursion resolver: expands an initial frontier of
    (row, ts, child code, position keys) through the child histories
    until leaf coordinates, returning (counts per row, lon_flat,
    lat_flat) in members.resolve_coords order — the engine behind
    _resolve_coords_rows and the old-style inner-ring resolver."""
    out_rows, out_keys, out_lon, out_lat = [], [], [], []
    depth = 0
    while len(frontier[0]) and depth < 8:
        frows, fts, fch, fkeys = frontier
        res_k = np.full(len(frows), -1, np.int64)
        o = np.argsort(fch, kind="stable")
        fch_s = fch[o]
        bounds = _group_bounds(fch_s)
        for bi in range(len(bounds) - 1):
            a, b = bounds[bi], bounds[bi + 1]
            ce = cmap.get(int(fch_s[a]))
            if ce is None:
                continue
            cs_, ct_ = P.ent_start[ce], P.ent_start[ce + 1]
            sel = o[a:b]
            k = np.searchsorted(P.ts2[cs_:ct_], fts[sel], side="right") - 1
            ok = k >= 0
            kk = cs_ + np.maximum(k, 0)
            ok &= P.vis2[kk]
            res_k[sel[ok]] = kk[ok]
        valid = res_k >= 0
        frows, fts, fkeys = frows[valid], fts[valid], [kk[valid] for kk in fkeys]
        res_k = res_k[valid]
        nmem = P.mem_end2[res_k] - P.mem_start2[res_k]
        leaf = nmem == 0
        if leaf.any():
            out_rows.append(frows[leaf])
            out_keys.append([kk[leaf] for kk in fkeys])
            out_lon.append(P.lon2[res_k[leaf]])
            out_lat.append(P.lat2[res_k[leaf]])
        exp = ~leaf
        if exp.any():
            erows, ets, ekeys = frows[exp], fts[exp], [kk[exp] for kk in fkeys]
            ek, en = res_k[exp], nmem[exp]
            g2 = _range_gather_idx(P.mem_start2[ek], en)
            pre2 = np.cumsum(en) - en
            pos2 = np.arange(len(g2), dtype=np.int64) - np.repeat(pre2, en)
            frontier = (
                np.repeat(erows, en),
                np.repeat(ets, en),
                P.mem_child[g2],
                [np.repeat(kk, en) for kk in ekeys] + [pos2],
            )
        else:
            frontier = (np.empty(0, np.int64),) * 3 + ([],)
        depth += 1

    if len(frontier[0]):
        # the per-document reference (members.resolve_coords) recurses
        # unboundedly; silently truncating deep leaves would diverge
        # from it — raise loudly (also catches membership cycles, which
        # the reference surfaces as RecursionError)
        raise ValueError(
            "member recursion exceeded depth 8 (cycle or unsupported nesting)"
        )

    if not out_rows:
        return (
            np.zeros(nrows, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    maxk = max(len(ks) for ks in out_keys)
    rows_c = np.concatenate(out_rows)
    keys_c = [
        np.concatenate(
            [
                ks[i] if i < len(ks) else np.zeros(len(r), np.int64)
                for ks, r in zip(out_keys, out_rows)
            ]
        )
        for i in range(maxk)
    ]
    lon_c = np.concatenate(out_lon)
    lat_c = np.concatenate(out_lat)
    o = np.lexsort(tuple(reversed(keys_c)) + (rows_c,))
    rows_c, lon_c, lat_c = rows_c[o], lon_c[o], lat_c[o]
    counts = np.bincount(rows_c, minlength=nrows).astype(np.int64)
    return counts, lon_c, lat_c


def _member_edit_uids(P: ParsedBatch, cmap: dict, row_ts, gk, base_uid):
    """Child-attributed uid for pure member edits (state version ts !=
    contribution ts): the LAST member (in member order) having a version
    at exactly ts wins; first (ts,v) version within that child
    (OSMContribution.java:211-257 via members.contributions_doc)."""
    uid = base_uid.copy()
    need = P.ts2[gk] != row_ts
    if not need.any():
        return uid
    nr = np.flatnonzero(need)
    g = gk[nr]
    counts = P.mem_end2[g] - P.mem_start2[g]
    rows = np.repeat(nr, counts)
    tcol = np.repeat(row_ts[nr], counts)
    gidx = _range_gather_idx(P.mem_start2[g], counts)
    ch = P.mem_child[gidx]
    prefix = np.cumsum(counts) - counts
    pos = np.arange(len(rows), dtype=np.int64) - np.repeat(prefix, counts)
    hit = np.zeros(len(rows), bool)
    huid = np.zeros(len(rows), np.int64)
    o = np.argsort(ch, kind="stable")
    ch_s = ch[o]
    bounds = _group_bounds(ch_s)
    for bi in range(len(bounds) - 1):
        a, b = bounds[bi], bounds[bi + 1]
        ce = cmap.get(int(ch_s[a]))
        if ce is None:
            continue
        cs_, ct_ = P.ent_start[ce], P.ent_start[ce + 1]
        sel = o[a:b]
        k = np.searchsorted(P.ts2[cs_:ct_], tcol[sel], side="left")
        ok = (k < ct_ - cs_) & (P.ts2[cs_ + np.minimum(k, ct_ - cs_ - 1)] == tcol[sel])
        hit[sel[ok]] = True
        huid[sel[ok]] = P.uid2[cs_ + k[ok]]
    if hit.any():
        hr, hp, hu = rows[hit], pos[hit], huid[hit]
        o2 = np.lexsort((hp, hr))
        hr, hu = hr[o2], hu[o2]
        last = np.empty(len(hr), bool)  # max pos per row wins
        last[:-1] = hr[1:] != hr[:-1]
        last[-1] = True
        uid[hr[last]] = hu[last]
    return uid


def _doc_contribs(P: ParsedBatch, d: int, t_from: int, t_to: int):
    """Per-doc contribution classification -> (n, cre, del, tag, geom,
    uid_sum) over emitted contributions in [t_from, t_to)."""
    pe = P.parent_ent(d)
    if pe is None:
        return 0, 0, 0, 0, 0, 0
    cmap = P.child_ents(d)
    memo: dict = {}
    mts = _collapsed_mod_ts(P, d, pe, cmap, memo)
    if not len(mts):
        return 0, 0, 0, 0, 0, 0
    s, t = P.ent_start[pe], P.ent_start[pe + 1]
    si = np.searchsorted(P.ts2[s:t], mts, side="right") - 1
    ok = si >= 0  # st is None -> skipped; only a sorted prefix can miss
    mts, si = mts[ok], si[ok]
    if not len(mts):
        return 0, 0, 0, 0, 0, 0
    gk = s + si
    p = P.vis2[gk] & P.match2[gk]
    p_prev = _shift1(p, False)
    emitted = p | p_prev
    creation = p & ~p_prev
    deletion = ~p & p_prev
    compare = p & p_prev
    sig_prev = _shift1(P.sig2[gk], -1)
    tag_chg = compare & (P.sig2[gk] != sig_prev)

    geom_chg = np.zeros(len(mts), bool)
    pr_idx = np.flatnonzero(p)
    if len(pr_idx):
        counts, lon_f, lat_f = _resolve_coords_rows(P, cmap, mts[pr_idx], gk[pr_idx])
        offs = np.empty(len(counts) + 1, np.int64)
        offs[0] = 0
        np.cumsum(counts, out=offs[1:])
        cmp_rows = np.flatnonzero(compare)
        if len(cmp_rows):
            # present-row rank: row r compares to present row rank-1
            rank = np.cumsum(p) - 1
            a = rank[cmp_rows]  # current present rank
            b = a - 1  # previous present rank (== row r-1, emitted)
            diff = counts[a] != counts[b]
            eqc = np.flatnonzero(~diff)
            if len(eqc):
                n_each = counts[a[eqc]]
                ga = _range_gather_idx(offs[a[eqc]], n_each)
                gb = _range_gather_idx(offs[b[eqc]], n_each)
                neq = (lon_f[ga] != lon_f[gb]) | (lat_f[ga] != lat_f[gb])
                if neq.any():
                    seg = np.repeat(np.arange(len(eqc)), n_each)
                    bad = np.zeros(len(eqc), bool)
                    np.logical_or.at(bad, seg, neq)
                    diff[eqc] = bad
            geom_chg[cmp_rows] = diff

    uid = P.uid2[gk].copy()
    if len(pr_idx):
        uid[pr_idx] = _member_edit_uids(
            P, cmap, mts[pr_idx], gk[pr_idx], uid[pr_idx]
        )

    rng = emitted & (mts >= t_from) & (mts < t_to)
    return (
        int(rng.sum()),
        int((creation & rng).sum()),
        int((deletion & rng).sum()),
        int((tag_chg & rng).sum()),
        int((geom_chg & rng).sum()),
        int(uid[rng].sum()),
    )


def contribution_stats_batch_vec(batch, t_from: int, t_to: int, match_kv=None):
    """Vectorized twin of members.contribution_stats_batch (same output
    schema: one partial row of n/creation/deletion/tag/geom/uid sums)."""
    P = ParsedBatch(batch, match_kv=match_kv)
    n = cre = dele = tag = geo = usum = 0
    for d in range(P.ndocs):
        a, b, c, e, f, g = _doc_contribs(P, d, int(t_from), int(t_to))
        n += a
        cre += b
        dele += c
        tag += e
        geo += f
        usum += g
    return pa.table(
        {
            "n_part": pa.array([n], type=pa.int64()),
            "creation_part": pa.array([cre], type=pa.int64()),
            "deletion_part": pa.array([dele], type=pa.int64()),
            "tag_part": pa.array([tag], type=pa.int64()),
            "geom_part": pa.array([geo], type=pa.int64()),
            "uid_part": pa.array([usum], type=pa.int64()),
        }
    )


def snapshot_geoms_batch_vec(batch, timestamps, match_kv=None, id_name="way_id"):
    """Vectorized twin of members.snapshot_geoms_batch: per (doc, query
    ts) the member-resolved geometry as integer-exact count + sums."""
    P = ParsedBatch(batch, match_kv=match_kv)
    tsq = np.asarray([int(x) for x in timestamps], dtype=np.int64)
    ids = batch["osm_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    oid_out, ts_out, n_out, slon_out, slat_out = [], [], [], [], []
    for d in range(P.ndocs):
        pe = P.parent_ent(d)
        if pe is None:
            continue
        cmap = P.child_ents(d)
        s, t = P.ent_start[pe], P.ent_start[pe + 1]
        si = np.searchsorted(P.ts2[s:t], tsq, side="right") - 1
        ok = si >= 0
        gk = s + np.maximum(si, 0)
        ok &= P.vis2[gk] & P.match2[gk]
        if cmap:  # doc has children: skip states without members
            ok &= (P.mem_end2[gk] - P.mem_start2[gk]) > 0
        rows = np.flatnonzero(ok)
        if not len(rows):
            continue
        counts, lon_f, lat_f = _resolve_coords_rows(P, cmap, tsq[rows], gk[rows])
        offs = np.r_[0, np.cumsum(counts)][:-1]
        # pad by one 0 so a trailing empty segment's offset (== len) is a
        # valid reduceat index; empty segments return the element AT the
        # offset, so zero them via the mask afterwards
        lon_p = np.r_[lon_f, np.int64(0)]
        lat_p = np.r_[lat_f, np.int64(0)]
        slon = np.add.reduceat(lon_p, offs) if len(offs) else np.zeros(0, np.int64)
        slat = np.add.reduceat(lat_p, offs) if len(offs) else np.zeros(0, np.int64)
        empty = counts == 0
        slon = np.where(empty, 0, slon)
        slat = np.where(empty, 0, slat)
        oid_out.append(np.full(len(rows), ids[d], np.int64))
        ts_out.append(tsq[rows])
        n_out.append(counts)
        slon_out.append(slon.astype(np.int64))
        slat_out.append(slat.astype(np.int64))

    cat = (
        lambda parts: np.concatenate(parts)
        if parts
        else np.empty(0, np.int64)
    )
    return pa.table(
        {
            id_name: pa.array(cat(oid_out)),
            "ts_q": pa.array(cat(ts_out)),
            "n_nodes": pa.array(cat(n_out)),
            "sum_lon": pa.array(cat(slon_out)),
            "sum_lat": pa.array(cat(slat_out)),
        }
    )


def snapshots_old_style_batch_vec(batch, timestamps, match_kv=None):
    """Vectorized twin of members.snapshots_old_style
    (CellIterator.java:260-318, BaseTagInterpreter
    .isOldStyleMultipolygon:111-136): per (doc, ts) where the relation
    version at ts is visible, old-style on the tag side, has EXACTLY
    one 'outer' member whose resolved way at ts is visible and matches
    ``match_kv``, emit the inner-hole metrics — ring count (rings with
    no resolved points are skipped, as resolve_member_rings) and the
    integer sums of hole-ring point coordinates. Rings start one level
    DOWN from the relation (inner member version first, then ITS
    members), so a memberless inner member contributes nothing — the
    reference's version_at + resolve_coords shape. Output: one row per
    qualifying (doc, ts) with columns ts_q, n_holes, sum_lon, sum_lat;
    A/B parity vs the per-document reference path is pinned in
    tests/test_members_vec.py."""
    P = ParsedBatch(batch, match_kv=match_kv)
    tsq = np.asarray([int(x) for x in timestamps], dtype=np.int64)
    ts_out, nh_out, sl_out, sa_out = [], [], [], []
    for d in range(P.ndocs):
        pe = P.parent_ent(d)
        if pe is None:
            continue
        cmap = P.child_ents(d)
        s, t = P.ent_start[pe], P.ent_start[pe + 1]
        si = np.searchsorted(P.ts2[s:t], tsq, side="right") - 1
        ok = si >= 0
        gk = s + np.maximum(si, 0)
        ok &= P.vis2[gk]
        if cmap:  # doc has children: skip states without members
            ok &= (P.mem_end2[gk] - P.mem_start2[gk]) > 0
        ok &= P.oldstyle2[gk]
        rows = np.flatnonzero(ok)
        if not len(rows):
            continue
        gkr, tr = gk[rows], tsq[rows]
        m = P.mem_end2[gkr] - P.mem_start2[gkr]
        gidx = _range_gather_idx(P.mem_start2[gkr], m)
        rowrep = np.repeat(np.arange(len(rows), dtype=np.int64), m)
        roles = P.mem_role[gidx]
        ch = P.mem_child[gidx]
        om = roles == "outer"
        keep = np.bincount(rowrep[om], minlength=len(rows)) == 1
        # the single outer member's way at ts: visible + filter match
        och = np.full(len(rows), -1, np.int64)
        och[rowrep[om]] = ch[om]
        for i in np.flatnonzero(keep):  # <= |timestamps| rows per doc
            ce = cmap.get(int(och[i]))
            if ce is None:
                keep[i] = False
                continue
            cs_, ct_ = P.ent_start[ce], P.ent_start[ce + 1]
            k = int(np.searchsorted(P.ts2[cs_:ct_], tr[i], side="right")) - 1
            if k < 0 or not P.vis2[cs_ + k] or not P.match2[cs_ + k]:
                keep[i] = False
        rowkeep = np.flatnonzero(keep)
        if not len(rowkeep):
            continue
        # inner rings: one resolver ROW per inner member of a kept row
        im = (roles == "inner") & keep[rowrep]
        ring_row = rowrep[im]
        ring_ch = ch[im]
        ring_ts = tr[ring_row]
        nring = len(ring_ch)
        rk = np.full(nring, -1, np.int64)  # ring's own version at ts
        o = np.argsort(ring_ch, kind="stable")
        chs = ring_ch[o]
        bounds = _group_bounds(chs)
        for bi in range(len(bounds) - 1):
            a, b = bounds[bi], bounds[bi + 1]
            ce = cmap.get(int(chs[a]))
            if ce is None:
                continue
            cs_, ct_ = P.ent_start[ce], P.ent_start[ce + 1]
            sel = o[a:b]
            k = np.searchsorted(P.ts2[cs_:ct_], ring_ts[sel], side="right") - 1
            okr = k >= 0
            kk = cs_ + np.maximum(k, 0)
            okr &= P.vis2[kk]
            rk[sel[okr]] = kk[okr]
        counts = np.zeros(nring, np.int64)
        slon = np.zeros(nring, np.int64)
        slat = np.zeros(nring, np.int64)
        live = np.flatnonzero(rk >= 0)
        if len(live):
            lk = rk[live]
            nm = P.mem_end2[lk] - P.mem_start2[lk]
            g2 = _range_gather_idx(P.mem_start2[lk], nm)
            pre = np.cumsum(nm) - nm
            pos = np.arange(len(g2), dtype=np.int64) - np.repeat(pre, nm)
            c, lon_f, lat_f = _resolve_frontier(
                P, cmap, nring,
                (
                    np.repeat(live, nm),
                    np.repeat(ring_ts[live], nm),
                    P.mem_child[g2],
                    [pos],
                ),
            )
            counts = c
            offs = np.r_[0, np.cumsum(counts)][:-1]
            lon_p = np.r_[lon_f, np.int64(0)]
            lat_p = np.r_[lat_f, np.int64(0)]
            if len(offs):
                slon = np.where(counts == 0, 0, np.add.reduceat(lon_p, offs))
                slat = np.where(counts == 0, 0, np.add.reduceat(lat_p, offs))
        n_holes = np.bincount(
            ring_row[counts > 0], minlength=len(rows)
        ).astype(np.int64)
        sum_lon = np.zeros(len(rows), np.int64)
        sum_lat = np.zeros(len(rows), np.int64)
        np.add.at(sum_lon, ring_row, slon)
        np.add.at(sum_lat, ring_row, slat)
        ts_out.append(tr[rowkeep])
        nh_out.append(n_holes[rowkeep])
        sl_out.append(sum_lon[rowkeep])
        sa_out.append(sum_lat[rowkeep])

    cat = (
        lambda parts: np.concatenate(parts)
        if parts
        else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "ts_q": pa.array(cat(ts_out)),
            "n_holes": pa.array(cat(nh_out)),
            "sum_lon": pa.array(cat(sl_out)),
            "sum_lat": pa.array(cat(sa_out)),
        }
    )
