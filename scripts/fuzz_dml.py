#!/usr/bin/env python3
"""DML-sequence differential fuzz for the GraftCatalog SQL surface
(S11/S14): generate seeded random statement sequences — CREATE, INSERT,
MERGE INTO (update/delete/insert branches), UPDATE, DELETE, key-moving
UPDATE (SET k = ...), ALTER TABLE ADD COLUMNS, and the maintenance
surface (CALL optimize / expire_versions / expire_changes — native SQL
stored procedures via the catalog's ProcedureCatalog leg), plus
multi-statement TRANSACTIONS (S45/S45b: begin_txn / staged DML /
savepoint / rollback_to_savepoint / commit_txn-or-rollback_txn, with the
publish modeled commit-by-commit: undone post-savepoint commits still
publish their changelog slices, then the rollback's RESTORE follows as a
boundary version) — run them through Spark via
graft.DmlRunner, and diff BOTH the final table contents and the
per-version changelog op counts against a Python state model that applies
the same statements to a dict. Key-uniqueness discipline is maintained by
construction (inserts draw fresh keys; key-move shifts are injective and
residue-preserving), matching the store's merge-key contract, so the
model is exact.

Usage: python3 scripts/fuzz_dml.py <nSequences> <seed>
"""
import json, os, random, subprocess, sys, tempfile
import pandas as pd

n_seq = int(sys.argv[1]) if len(sys.argv) > 1 else 8
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
rng = random.Random(seed)

NAMES = ["ada", "bob", "cyd", "dee", "eli"]


def row_sort_key(r):
    """Total order over (probe, k, name, amount) rows: keyless programs
    carry duplicate (k, name) pairs, so the amount must join the key (it
    may be None/NaN on keyed programs' evolved schemas — normalized so
    the sort stays total)."""
    a = r[3]
    a_ok = a is not None and a == a  # NaN-safe
    return (r[0], r[1], r[2] or "", a_ok, a if a_ok else 0)


def gen_keyless(idx):
    """Keyless APPEND-ONLY program (S43 x S39): no row identity, no
    UPDATE/DELETE — inserts (duplicate whole rows legal), a branch leg
    whose divergence ALWAYS rebases (appends commute), and an MV leg
    whose refresh folds the all-I changelog. The model is a row
    multiset; change counts are pure-I per commit, with a rebased branch
    commit landing one version after the divergence it replays over."""
    t = f"fz_dml_{idx}"
    rows = []            # multiset of (k, name, amount)
    changes = []
    version = 0
    stmts = [f"DROP TABLE IF EXISTS graftdml.{t}",
             f"CREATE TABLE graftdml.{t} (k BIGINT NOT NULL, name STRING, "
             f"amount BIGINT) USING graft TBLPROPERTIES "
             f"('append_only'='true', 'buckets'='4')"]

    def lit(nm):
        return "NULL" if nm is None else f"'{nm}'"

    def ins_values(tgt, n):
        batch = [(rng.randint(1, 500), rng.choice(NAMES + [None]),
                  rng.randint(0, 1000)) for _ in range(n)]
        stmts.append(f"INSERT INTO {tgt} VALUES " + ", ".join(
            f"({k}, {lit(nm)}, {a})" for k, nm, a in batch))
        return batch

    def commit(n):
        nonlocal version
        version += 1
        changes.append((version, {"I": n}))

    for _ in range(rng.randint(3, 6)):
        b = ins_values(f"graftdml.{t}", rng.randint(1, 8))
        rows.extend(b); commit(len(b))
    if rng.random() < 0.5:
        stmts.append(f"CALL graftdml.create_branch(table => '{t}', "
                     f"name => 'fzk')")
        bb = ins_values(f"graftdml.`{t}$branch$fzk`", rng.randint(1, 6))
        mb = ins_values(f"graftdml.{t}", rng.randint(1, 6))
        rows.extend(mb); commit(len(mb))
        stmts.append(f"CALL graftdml.rebase_branch(table => '{t}', "
                     f"name => 'fzk')")
        stmts.append(f"CALL graftdml.fast_forward(table => '{t}', "
                     f"name => 'fzk')")
        rows.extend(bb); commit(len(bb))
    mv_leg = rng.random() < 0.5
    if mv_leg:
        stmts.append(f"DROP MATERIALIZED VIEW IF EXISTS graftdml.mv_{t}")
        stmts.append(f"CREATE MATERIALIZED VIEW graftdml.mv_{t} AS "
                     f"SELECT COALESCE(name, '~') AS g, COUNT(*) AS n, "
                     f"SUM(amount) AS s FROM graftdml.{t} "
                     f"GROUP BY COALESCE(name, '~')")
        for _ in range(2):
            b = ins_values(f"graftdml.{t}", rng.randint(1, 6))
            rows.extend(b); commit(len(b))
        stmts.append(f"CALL graftdml.refresh_mv(view => 'mv_{t}')")
    lo = rng.randint(0, 600); hi = lo + rng.randint(50, 500)
    pk = rng.choice([k for k, _, _ in rows]) if rows else 1
    mv_union = ("" if not mv_leg else
                f" UNION ALL SELECT 'mv', n, g, s FROM graftdml.mv_{t}")
    stmts.append(
        f"SELECT 'full' AS probe, k, name, amount FROM graftdml.{t} "
        f"UNION ALL SELECT 'rng', k, name, amount FROM graftdml.{t} "
        f"WHERE amount BETWEEN {lo} AND {hi} "
        f"UNION ALL SELECT 'key', k, name, amount FROM graftdml.{t} "
        f"WHERE k = {pk}{mv_union} ORDER BY 1, 2")
    mv_exp = []
    if mv_leg:
        groups = {}
        for _, nm, a in rows:
            g = nm if nm is not None else "~"
            c, ssum = groups.get(g, (0, 0))
            groups[g] = (c + 1, ssum + a)
        mv_exp = [("mv", c, g, ssum) for g, (c, ssum) in groups.items()]
    exp_rows = sorted(
        [("full", k, nm, a) for k, nm, a in rows] +
        [("rng", k, nm, a) for k, nm, a in rows if lo <= a <= hi] +
        [("key", k, nm, a) for k, nm, a in rows if k == pk] + mv_exp,
        key=row_sort_key)
    exp_changes = sorted((v, op, c) for v, counts in changes
                         for op, c in counts.items())
    return stmts, exp_rows, exp_changes


def gen_sequence(idx):
    """Returns (statements_for_spark, expected_rows, expected_change_counts)."""
    t = f"fz_dml_{idx}"
    state = {}           # k -> (name, amount)
    used = set()
    changes = []         # (version, op) counts per committed statement
    # merge-on-read must be semantically invisible: the SAME model covers
    # both modes (identical contents AND identical changelog); half the
    # programs start 'mor' and a set_mode template flips it mid-program
    # a third of the programs run PARTITIONED BY (name): identity
    # partition dirs above the buckets, rows MOVING partitions on every
    # rename/update of the name, plus the expire_partitions template.
    # Since r13 partitioning composes with merge_mode='mor' (bucket-scoped
    # delete slices suppress a key's older rows in every partition), so
    # partitioned programs draw their mode like any other; the partition
    # column still cannot be dropped, and the generated RTAS would
    # silently de-partition, so those two templates stay skipped.
    partitioned = rng.random() < 0.34
    mode = rng.choice(["cow", "mor"])
    part_clause = " PARTITIONED BY (name)" if partitioned else ""
    stmts = [f"DROP TABLE IF EXISTS graftdml.{t}",
             f"CREATE TABLE graftdml.{t} (k BIGINT NOT NULL, name STRING, "
             f"amount BIGINT) USING graft{part_clause} TBLPROPERTIES "
             f"('merge_key'='k', 'buckets'='4', 'merge_mode'='{mode}')"]
    version = 0
    altered = 0          # extra columns added so far
    renamed = 0          # rename counter (fresh logical names)
    cn = {"k": "k", "name": "name", "amount": "amount"}  # role -> current name
    # (current_name, role) in SCHEMA ORDER — positional inserts (REPLACE
    # WHERE takes no column list) must match it; drop_readd re-appends the
    # string column at the END, alter appends extras
    schema_cols = [["k", "k"], ["name", "name"], ["amount", "amount"]]

    def fresh_keys(n):
        ks = []
        while len(ks) < n:
            k = rng.randint(1, 500)
            if k not in used:
                used.add(k); ks.append(k)
        return ks

    def commit(ops):
        nonlocal version, dv_live
        version += 1
        counts = {}
        for op in ops:
            counts[op] = counts.get(op, 0) + 1
        changes.append((version, counts))
        # a merge-on-read commit with any removed key (op U or D) writes a
        # live equality-delete slice instead of rewriting buckets
        if mode == "mor" and any(op in ("U", "D") for op in ops):
            dv_live = True
        history[version] = (dict(state), n_drops, buckets, dv_live)

    buckets = 4          # fan-out of the CURRENT layout (restore rolls it back)
    meta_buckets = 4     # declared fan-out in _meta.json (restore does NOT)
    dv_live = False      # live merge-on-read delete slices in CURRENT version
    # snapshots for the restore template: version -> (dict(state), n_drops
    # performed so far, layout fan-out, dv_live). A restore to a pre-DROP
    # snapshot reads the string column as NULL (tombstoned physical column
    # never resurrects); a restore across a rebucket brings back the OLD
    # layout; a restore to a DV-live version brings back its slices.
    history = {0: ({}, 0, 4, False)}
    n_drops = 0
    live_tags = []       # named refs created and not yet dropped (S36)
    tag_n = 0
    n_stmt = rng.randint(5, 9)
    for _ in range(n_stmt):
        kind = rng.choice(["insert", "insert", "merge", "merge", "update",
                           "delete", "overwrite", "keymove", "alter",
                           "optimize", "expire_changes", "expire_versions",
                           "rename", "rename", "drop_readd", "rebucket",
                           "merge_nmbs", "restore", "replace_where",
                           "set_mode", "rtas", "expire_partitions",
                           "merge_evolve", "set_bloom", "tag_cycle",
                           "txn", "txn"])
        if partitioned and kind in ("drop_readd", "rtas"):
            continue  # partition column undroppable;
                      # the generated RTAS would silently de-partition
        if kind == "expire_partitions":
            if not partitioned:
                continue
            # metadata-only boundary commit: drop every partition whose
            # name sorts below the cut; one version bump iff any matched,
            # NO changelog slice (like overwrite/restore)
            cut = rng.choice(NAMES[1:])  # never below the minimum
            stmts.append(f"CALL graftdml.expire_partitions("
                         f"table => '{t}', below => '{cut}')")
            dropped = [k for k in state
                       if state[k][0] is not None and state[k][0] < cut]
            if dropped:
                for k in dropped:
                    del state[k]
                version += 1
                history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "rtas":
            # atomic REPLACE TABLE AS SELECT (identity projection of the
            # live contents, under the CURRENT logical names): one claimed
            # boundary commit, contents preserved, fresh layout/meta —
            # schema identities reset, so later restores must not cross it
            # (old files' physical names are gone from the new meta);
            # the model prunes pre-RTAS history accordingly
            target = rng.choice([2, 4, 8])
            sel = ", ".join(
                f"{name} AS {name}" for name, _ in schema_cols)
            stmts.append(
                f"REPLACE TABLE graftdml.{t} USING graft TBLPROPERTIES "
                f"('merge_key'='{cn['k']}', 'buckets'='{target}', "
                f"'merge_mode'='{mode}') "
                f"AS SELECT {sel} FROM graftdml.{t}")
            buckets = target
            meta_buckets = target
            dv_live = False        # the staged store is freshly written
            version += 1           # exactly one boundary commit
            history.clear()        # restores may not cross the replace
            history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "set_mode":
            # meta-only flip, effective from the NEXT row-level commit;
            # existing delete slices stay valid either way (a cow rewrite
            # carries/applies them like any other commit)
            mode = "mor" if mode == "cow" else "cow"
            stmts.append(f"ALTER TABLE graftdml.{t} SET TBLPROPERTIES "
                         f"('merge_mode'='{mode}')")
            continue
        if kind == "tag_cycle":
            # content-neutral named refs (S36): pin a recent version under
            # a tag (expire_versions must then keep it and every owner
            # slot it references — the real interplay surface with
            # manifests, mor slices and partition dirs), or drop a live
            # tag so a later expire reclaims the version. Never touches
            # contents or the changelog.
            if live_tags and rng.random() < 0.5:
                name = live_tags.pop(rng.randrange(len(live_tags)))
                stmts.append(f"CALL graftdml.drop_tag('{t}', '{name}')")
            else:
                tag_n += 1
                name = f"fz-tag-{tag_n}"
                v = rng.randint(max(0, version - 2), version)
                stmts.append(f"CALL graftdml.create_tag("
                             f"table => '{t}', name => '{name}', "
                             f"version => {v})")
                live_tags.append(name)
            continue
        if kind == "set_bloom":
            # content-neutral: toggles per-column parquet bloom filters on
            # the amount column (or clears them) — later commits write the
            # declared footers, queries must be unaffected; interleaves
            # with every other template including mode flips and RTAS
            # (which resets table properties)
            cols = rng.choice([cn["amount"], ""])
            stmts.append(f"ALTER TABLE graftdml.{t} SET TBLPROPERTIES "
                         f"('bloom_filter_columns'='{cols}')")
            continue
        if kind == "replace_where":
            # predicate-scoped atomic overwrite: delete the amount > cut
            # region, upsert fresh-key rows — ONE commit, D + U change rows
            cut = rng.randint(200, 900)
            rows = [(k, rng.choice(NAMES), rng.randint(0, 1000))
                    for k in fresh_keys(rng.randint(1, 3))]
            vals = ", ".join(f"({k}, '{n}', {a})" for k, n, a in rows)
            exprs = ", ".join(
                {"k": "v.k", "name": "v.name", "amount": "v.amount",
                 "extra": "CAST(NULL AS STRING)"}[role]
                for _, role in schema_cols)
            stmts.append(
                f"INSERT INTO graftdml.{t} "
                f"REPLACE WHERE {cn['amount']} > {cut} "
                f"SELECT {exprs} FROM (VALUES {vals}) AS v(k, name, amount)")
            ops = []
            for k in list(state):
                if state[k][1] > cut:
                    del state[k]; ops.append("D")
            for k, n, a in rows:
                state[k] = (n, a); ops.append("U")
            commit(ops)
            continue
        if kind == "restore":
            # roll back to one of the LAST 2 versions (always retained —
            # expire_versions keeps 3): content snapshot restored, one
            # version bump, NO change rows (snapshot boundary)
            cands = [v for v in history if version - 2 <= v <= version]
            v = rng.choice(cands)
            stmts.append(f"CALL graftdml.restore('{t}', {v})")
            if v != version:
                snap, era, snap_buckets, snap_dv = history[v]
                state.clear()
                for k, (nm, a) in snap.items():
                    state[k] = (None if n_drops > era else nm, a)
                buckets = snap_buckets  # layout rolls back; meta does not
                dv_live = snap_dv       # the target's slices come back verbatim
                version += 1
                history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "rebucket":
            # layout-only fan-out change: one version bump, NO change rows,
            # content identical; a same-count call is a no-op
            target = rng.choice([2, 4, 8, 16])
            stmts.append(f"CALL graftdml.rebucket('{t}', {target})")
            # the store's no-op check requires BOTH the current layout AND
            # the declared meta fan-out to already equal the target (a
            # restore rolls back only the layout, so the two can diverge)
            if not (target == buckets and target == meta_buckets):
                buckets = target
                meta_buckets = target
                dv_live = False  # rebucket rewrites everything, DVs applied
                version += 1
                history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "merge_nmbs":
            # the third MERGE branch: target-only rows (NOT MATCHED BY
            # SOURCE) delete above a cutoff, otherwise get bumped — plus
            # the usual matched-update / unmatched-insert legs
            src = []
            for k in rng.sample(sorted(state), min(len(state), rng.randint(0, 3))):
                src.append((k, rng.choice(NAMES), rng.randint(0, 1000)))
            for k in fresh_keys(rng.randint(0, 2)):
                src.append((k, rng.choice(NAMES), rng.randint(0, 1000)))
            if not src:
                continue
            cut = rng.randint(200, 900)
            vals = ", ".join(f"({k}, '{n}', {a})" for k, n, a in src)
            stmts.append(
                f"MERGE INTO graftdml.{t} x USING (SELECT * FROM (VALUES {vals}) "
                f"AS v(k, name, amount)) s ON x.{cn['k']} = s.k "
                f"WHEN MATCHED THEN UPDATE SET {cn['name']} = s.name, "
                f"{cn['amount']} = s.amount "
                f"WHEN NOT MATCHED THEN INSERT ({cn['k']}, {cn['name']}, "
                f"{cn['amount']}) VALUES (s.k, s.name, s.amount) "
                f"WHEN NOT MATCHED BY SOURCE AND x.{cn['amount']} > {cut} "
                f"THEN DELETE "
                f"WHEN NOT MATCHED BY SOURCE THEN UPDATE SET "
                f"{cn['amount']} = {cn['amount']} + 5")
            src_keys = {k for k, _, _ in src}
            ops = []
            for k, n, a in src:
                if k in state:
                    state[k] = (n, a); ops.append("U")
                else:
                    state[k] = (n, a); ops.append("I")
            for k in list(state):
                if k not in src_keys:
                    n, a = state[k]
                    if a > cut:
                        del state[k]; ops.append("D")
                    else:
                        state[k] = (n, a + 5); ops.append("U")
            commit(ops)
            continue
        if kind == "merge_evolve":
            # MERGE WITH SCHEMA EVOLUTION: the source carries a column the
            # target doesn't have — the analyzer auto-ADDs it through the
            # catalog (metadata-only), then the merge lands values in it.
            # The model only tracks the core roles, so contents-wise this
            # is a plain upsert merge; the schema grows by one extra.
            altered += 1
            evo = f"evo_{idx}_{altered}"
            src_rows = []
            for k in rng.sample(sorted(state), min(len(state), rng.randint(0, 2))):
                src_rows.append((k, rng.choice(NAMES), rng.randint(0, 1000)))
            for k in fresh_keys(rng.randint(1, 2)):
                src_rows.append((k, rng.choice(NAMES), rng.randint(0, 1000)))
            # types must MATCH the target exactly: the evolution rule
            # diffs source vs target schemas and would otherwise request a
            # merge-key type change the store (correctly) rejects
            vals = ", ".join(
                f"(CAST({k} AS BIGINT), '{n}', CAST({a} AS BIGINT), 'e{k}')"
                for k, n, a in src_rows)
            stmts.append(
                f"MERGE WITH SCHEMA EVOLUTION INTO graftdml.{t} x "
                f"USING (SELECT * FROM (VALUES {vals}) "
                f"AS v(k, name, amount, {evo})) s ON x.{cn['k']} = s.k "
                f"WHEN MATCHED THEN UPDATE SET {cn['name']} = s.name, "
                f"{cn['amount']} = s.amount, {evo} = s.{evo} "
                f"WHEN NOT MATCHED THEN INSERT ({cn['k']}, {cn['name']}, "
                f"{cn['amount']}, {evo}) VALUES (s.k, s.name, s.amount, s.{evo})")
            schema_cols.append([evo, "extra"])
            ops = []
            for k, n, a in src_rows:
                if k in state:
                    state[k] = (n, a); ops.append("U")
                else:
                    state[k] = (n, a); ops.append("I")
            commit(ops)
            continue
        if kind == "rename":
            # metadata-only rename (column mapping): every later statement
            # must address the column by its CURRENT logical name; the
            # model's roles never change, only the SQL spelling does
            role = rng.choice(["k", "name", "amount"])
            renamed += 1
            new = f"{role}_r{renamed}"
            stmts.append(f"ALTER TABLE graftdml.{t} RENAME COLUMN {cn[role]} TO {new}")
            for sc in schema_cols:
                if sc[1] == role:
                    sc[0] = new
            cn[role] = new
            continue
        if kind == "drop_readd":
            # drop the string column and re-add under a fresh logical name:
            # the tombstoned physical column must NOT resurrect, so every
            # existing row's value becomes NULL in the model
            renamed += 1
            n_drops += 1
            new = f"name_d{renamed}"
            stmts.append(f"ALTER TABLE graftdml.{t} DROP COLUMN {cn['name']}")
            stmts.append(f"ALTER TABLE graftdml.{t} ADD COLUMNS ({new} STRING)")
            schema_cols[:] = [sc for sc in schema_cols if sc[1] != "name"]
            schema_cols.append([new, "name"])
            cn["name"] = new
            for k in state:
                state[k] = (None, state[k][1])
            continue
        if kind == "keymove":
            # UPDATE that reassigns the merge key. shift % mod == 0 keeps
            # the residue class closed: every displacement target either
            # doesn't exist or itself matched and moved, so the shift is a
            # clean injective move of the matching subset. Each moved row
            # commits as D(old key) + U(new row).
            mod, rem = rng.choice([(2, 0), (3, 1), (5, 2)])
            shift = mod * rng.randint(500, 900)
            stmts.append(f"UPDATE graftdml.{t} SET {cn['k']} = {cn['k']} + {shift} "
                         f"WHERE {cn['k']} % {mod} = {rem}")
            moved = [k for k in state if k % mod == rem]
            moved_rows = {k + shift: state[k] for k in moved}
            for k in moved:
                del state[k]
            state.update(moved_rows)
            used.update(moved_rows)
            commit(["D", "U"] * len(moved))
            continue
        if kind == "alter":
            # meta-only widen: history null-fills; the final SELECT pins
            # the original columns so the model is unchanged. INSERTs use
            # explicit column lists, so later statements stay valid.
            altered += 1
            stmts.append(f"ALTER TABLE graftdml.{t} ADD COLUMNS "
                         f"(extra_{idx}_{altered} STRING)")
            schema_cols.append([f"extra_{idx}_{altered}", "extra"])
            continue
        if kind == "optimize":
            # maxFilesPerBucket=0 rewrites every non-empty bucket —
            # deterministic for the model: one version bump iff any data.
            # Randomly exercise the r10 layout knobs (sorted range-split
            # files / target_file_rows) — layout-only, so the model is
            # unchanged, but the predicate probe legs in the final read
            # then scan zone maps produced by every optimize shape.
            extra = rng.choice([
                "",
                f", sort_by => '{cn['amount']}', target_file_rows => 7",
                ", target_file_rows => 5"])
            stmts.append(
                f"CALL graftdml.optimize(table => '{t}', "
                f"max_files_per_bucket => 0{extra})")
            # commits iff any bucket has files: live rows, OR dead rows
            # still on disk under live delete slices (which optimize is
            # also the operation that folds away)
            if state or dv_live:
                dv_live = False
                version += 1
                history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "expire_versions":
            stmts.append(f"CALL graftdml.expire_versions('{t}', 3)")  # content no-op
            continue
        if kind == "expire_changes":
            horizon = max(1, version - 1)
            stmts.append(f"CALL graftdml.expire_changes('{t}', {horizon})")
            changes = [(v, c) for v, c in changes if v >= horizon]
            continue
        if kind == "overwrite":
            # ONE atomic version commit (r8) with NO changelog slice — the
            # missing slice is the detectable truncation boundary a CDC
            # consumer must re-snapshot across
            rows = [(k, rng.choice(NAMES), rng.randint(0, 1000))
                    for k in fresh_keys(rng.randint(1, 4))]
            vals = ", ".join(f"({k}, '{n}', {a})" for k, n, a in rows)
            stmts.append(f"INSERT OVERWRITE graftdml.{t} ({cn['k']}, {cn['name']}, {cn['amount']}) VALUES {vals}")
            state.clear()
            for k, n, a in rows:
                state[k] = (n, a)
            dv_live = False  # an overwrite carries nothing over
            version += 1  # the overwrite commit: no change rows
            history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "txn":
            # S45/S45b: a multi-statement TRANSACTION over this table —
            # plain-name DML routes to a hidden branch; commit_txn
            # publishes the staged commits into main COMMIT-BY-COMMIT,
            # so version numbers, per-version changelog op counts and
            # contents must be IDENTICAL to a direct run of the same
            # statements; rollback_txn leaves nothing at all. A slice of
            # the committed txns runs the savepoint leg: statements
            # staged past the mark vanish from the publish, and the
            # rollback's RESTORE rides along as one extra boundary
            # commit (version bump, NO changelog slice). An empty-match
            # staged UPDATE/DELETE still commits a version on the
            # branch, mirroring commit([]) on the direct path.
            pre_state = dict(state)
            stmts.append(f"CALL graftdml.begin_txn(tables => '{t}')")
            staged = []  # (ops, state snapshot) per staged statement

            def stage_one():
                skind = rng.choice(["ins", "ins", "upd", "del"])
                if skind == "ins" or not state:
                    rows_ = [(k, rng.choice(NAMES), rng.randint(0, 1000))
                             for k in fresh_keys(rng.randint(1, 3))]
                    vals = ", ".join(f"({k}, '{n}', {a})"
                                     for k, n, a in rows_)
                    stmts.append(
                        f"INSERT INTO graftdml.{t} ({cn['k']}, "
                        f"{cn['name']}, {cn['amount']}) VALUES {vals}")
                    for k, n, a in rows_:
                        state[k] = (n, a)
                    staged.append((["I"] * len(rows_), dict(state)))
                elif skind == "upd":
                    bump = rng.randint(1, 50)
                    mod_, rem_ = rng.choice([(2, 0), (3, 1), (5, 2)])
                    stmts.append(
                        f"UPDATE graftdml.{t} SET {cn['amount']} = "
                        f"{cn['amount']} + {bump} "
                        f"WHERE {cn['k']} % {mod_} = {rem_}")
                    ops_ = []
                    for k in list(state):
                        if k % mod_ == rem_:
                            n, a = state[k]
                            state[k] = (n, a + bump); ops_.append("U")
                    staged.append((ops_, dict(state)))
                else:
                    cut_ = rng.randint(200, 900)
                    stmts.append(f"DELETE FROM graftdml.{t} "
                                 f"WHERE {cn['amount']} > {cut_}")
                    ops_ = []
                    for k in list(state):
                        if state[k][1] > cut_:
                            del state[k]; ops_.append("D")
                    staged.append((ops_, dict(state)))

            for _ in range(rng.randint(1, 2)):
                stage_one()
            decide = rng.random()
            if decide < 0.25:
                stmts.append("CALL graftdml.rollback_txn()")
                state.clear(); state.update(pre_state)
                continue
            extra_boundary = False
            sp_len = len(staged)
            if decide < 0.55:
                # savepoint leg. NOTE the publish shape: fast_forward
                # adopts EVERY branch commit, so the post-mark (undone)
                # commits still publish with their changelog slices —
                # then the rollback's RESTORE follows as a boundary
                # commit that reverts the content. CDC consumers
                # re-snapshot at the boundary; the model mirrors all of
                # it exactly.
                sp_state = dict(state)
                stmts.append("CALL graftdml.savepoint(name => 'fzsp')")
                for _ in range(rng.randint(1, 2)):
                    stage_one()
                stmts.append(
                    "CALL graftdml.rollback_to_savepoint(name => 'fzsp')")
                extra_boundary = len(staged) > sp_len
                state.clear(); state.update(sp_state)
            stmts.append("CALL graftdml.commit_txn()")
            dv_mark = dv_live
            for i, (ops_, snap) in enumerate(staged):
                version += 1
                counts = {}
                for op in ops_:
                    counts[op] = counts.get(op, 0) + 1
                changes.append((version, counts))
                if mode == "mor" and any(op in ("U", "D") for op in ops_):
                    dv_live = True
                history[version] = (dict(snap), n_drops, buckets, dv_live)
                if i == sp_len - 1:
                    dv_mark = dv_live  # delete-slice state AT the mark
            if extra_boundary:
                # the restore commit: content = the mark's, the target
                # version's delete slices come back verbatim, NO slice
                version += 1
                dv_live = dv_mark
                history[version] = (dict(state), n_drops, buckets, dv_live)
            continue
        if kind == "insert" or not state:
            rows = [(k, rng.choice(NAMES), rng.randint(0, 1000))
                    for k in fresh_keys(rng.randint(1, 6))]
            vals = ", ".join(f"({k}, '{n}', {a})" for k, n, a in rows)
            stmts.append(f"INSERT INTO graftdml.{t} ({cn['k']}, {cn['name']}, {cn['amount']}) VALUES {vals}")
            for k, n, a in rows:
                state[k] = (n, a)
            commit(["I"] * len(rows))
        elif kind == "merge":
            # source: mix of existing keys (update/delete) and fresh (insert)
            src = []
            for k in rng.sample(sorted(state), min(len(state), rng.randint(1, 5))):
                op = rng.choice(["u", "d"])
                src.append((k, rng.choice(NAMES), rng.randint(0, 1000), op))
            for k in fresh_keys(rng.randint(0, 3)):
                src.append((k, rng.choice(NAMES), rng.randint(0, 1000),
                            rng.choice(["u", "d"])))  # unmatched d = no-op
            if not src:
                continue
            vals = ", ".join(f"({k}, '{n}', {a}, '{op}')" for k, n, a, op in src)
            stmts.append(
                f"MERGE INTO graftdml.{t} x USING (SELECT * FROM (VALUES {vals}) "
                f"AS v(k, name, amount, op)) s ON x.{cn['k']} = s.k "
                f"WHEN MATCHED AND s.op = 'd' THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET {cn['name']} = s.name, "
                f"{cn['amount']} = s.amount "
                f"WHEN NOT MATCHED AND s.op <> 'd' THEN "
                f"INSERT ({cn['k']}, {cn['name']}, {cn['amount']}) "
                f"VALUES (s.k, s.name, s.amount)")
            ops = []
            for k, n, a, op in src:
                if k in state and op == "d":
                    del state[k]; ops.append("D")
                elif k in state:
                    state[k] = (n, a); ops.append("U")
                elif op != "d":
                    state[k] = (n, a); ops.append("I")
            commit(ops)
        elif kind == "update":
            delta = rng.randint(1, 50)
            mod, rem = rng.choice([(2, 0), (3, 1), (5, 2)])
            stmts.append(f"UPDATE graftdml.{t} SET {cn['amount']} = "
                         f"{cn['amount']} + {delta} "
                         f"WHERE {cn['k']} % {mod} = {rem}")
            ops = []
            for k in list(state):
                if k % mod == rem:
                    n, a = state[k]; state[k] = (n, a + delta); ops.append("U")
            commit(ops)
        else:
            cut = rng.randint(200, 900)
            stmts.append(f"DELETE FROM graftdml.{t} WHERE {cn['amount']} > {cut}")
            ops = []
            for k in list(state):
                if state[k][1] > cut:
                    del state[k]; ops.append("D")
            commit(ops)
    # a third of the programs close through a MATERIALIZED VIEW (S39):
    # the MV materializes over the program's end state, two more DML
    # commits land (the same update/delete templates), and ONE refresh
    # must fold them — the count/sum per name-group is diffed against the
    # model below. The refresh rides the incremental lane on clean ranges
    # and the recompute lane across boundaries/expired slices the program
    # happened to produce; CONTENT is the contract either way, so this
    # differential-checks the delta algebra over every merge-mode /
    # partitioning / schema-evolution end state the fuzzer generates.
    mv_leg = rng.random() < 0.34
    if mv_leg:
        stmts.append(f"DROP MATERIALIZED VIEW IF EXISTS graftdml.mv_{t}")
        stmts.append(
            f"CREATE MATERIALIZED VIEW graftdml.mv_{t} AS "
            f"SELECT COALESCE({cn['name']}, '~') AS g, COUNT(*) AS n, "
            f"SUM({cn['amount']}) AS s FROM graftdml.{t} "
            f"GROUP BY COALESCE({cn['name']}, '~')")
        # half the MV legs land their two DML commits on a BRANCH that is
        # fast_forwarded before the refresh: the adopted commit-by-commit
        # changelog must fold exactly like direct commits (same version
        # numbers, same per-version op counts — exp_changes unchanged),
        # differential-checking the S39×S40 interaction over every table
        # end state the fuzzer generates
        via_branch = rng.random() < 0.5
        if via_branch:
            stmts.append(f"CALL graftdml.create_branch("
                         f"table => '{t}', name => 'fzmv')")
            tgt = f"graftdml.`{t}$branch$fzmv`"
        else:
            tgt = f"graftdml.{t}"
        delta2, mod2, rem2 = rng.randint(1, 50), rng.choice([2, 3, 5]), 0
        stmts.append(f"UPDATE {tgt} SET {cn['amount']} = "
                     f"{cn['amount']} + {delta2} "
                     f"WHERE {cn['k']} % {mod2} = {rem2}")
        ops = []
        for k in list(state):
            if k % mod2 == rem2:
                n, a = state[k]; state[k] = (n, a + delta2); ops.append("U")
        commit(ops)
        cut2 = rng.randint(200, 900)
        stmts.append(f"DELETE FROM {tgt} WHERE {cn['amount']} > {cut2}")
        ops = []
        for k in list(state):
            if state[k][1] > cut2:
                del state[k]; ops.append("D")
        commit(ops)
        if via_branch:
            stmts.append(f"CALL graftdml.fast_forward("
                         f"table => '{t}', name => 'fzmv')")
        stmts.append(f"CALL graftdml.refresh_mv(view => 'mv_{t}')")

    # final read = full scan UNION predicate probes: a range predicate
    # (zone-map file skipping) and a key equality (bucket pruning + zone
    # maps) — if either prunes a file it shouldn't, rows vanish from a
    # probe leg and the diff below catches it. `probe` leads the sort key
    # so (probe, k) stays unique (NULL names never get compared).
    lo = rng.randint(0, 600)
    hi = lo + rng.randint(50, 500)
    pk = rng.choice(sorted(used)) if used else 1
    sel = f"{cn['k']} AS k, {cn['name']} AS name, {cn['amount']} AS amount"
    # a third of the programs read their FINAL STATE through a SQL view
    # (S38): the view body captures the end-of-program column names, so
    # the probes exercise view expansion over every schema-evolution /
    # mor / partition end state the program produced — pruning through
    # the expanded body must behave exactly like the direct read
    if rng.random() < 0.34:
        stmts.append(f"CREATE OR REPLACE VIEW graftdml.v_{t} AS "
                     f"SELECT {sel} FROM graftdml.{t}")
        src, selv, a_col, k_col = f"graftdml.v_{t}", \
            "k AS k, name AS name, amount AS amount", "amount", "k"
    else:
        src, selv, a_col, k_col = f"graftdml.{t}", sel, cn['amount'], cn['k']
    # the mv leg rides the same 4-column diff frame: (probe='mv',
    # k=count, name=group, amount=sum) — groups are unique per leg, so
    # the (probe, k, name) sort prefix never compares a NULL
    mv_union = ("" if not mv_leg else
                f" UNION ALL SELECT 'mv', n, g, s FROM graftdml.mv_{t}")
    stmts.append(
        f"SELECT 'full' AS probe, {selv} FROM {src} "
        f"UNION ALL SELECT 'rng', {selv} FROM {src} "
        f"WHERE {a_col} BETWEEN {lo} AND {hi} "
        f"UNION ALL SELECT 'key', {selv} FROM {src} "
        f"WHERE {k_col} = {pk}{mv_union} ORDER BY 1, 2")
    mv_exp = []
    if mv_leg:
        groups = {}
        for k, (n, a) in state.items():
            g = n if n is not None else "~"
            c, ssum = groups.get(g, (0, 0))
            groups[g] = (c + 1, ssum + a)
        mv_exp = [("mv", c, g, ssum) for g, (c, ssum) in groups.items()]
    exp_rows = sorted(
        [("full", k, n, a) for k, (n, a) in state.items()] +
        [("rng", k, n, a) for k, (n, a) in state.items()
         if a is not None and lo <= a <= hi] +
        [("key", k, n, a) for k, (n, a) in state.items() if k == pk] +
        mv_exp,
        key=row_sort_key)
    exp_changes = sorted((v, op, c) for v, counts in changes
                         for op, c in counts.items())
    return stmts, exp_rows, exp_changes

# ~1/6 of the programs run the keyless append-only lane
cases = {f"fz_dml_{i}": (gen_keyless(i) if rng.random() < 0.17
                         else gen_sequence(i)) for i in range(n_seq)}
work = tempfile.mkdtemp(prefix="graft_dml_fuzz_")
seq_path = os.path.join(work, "sequences.json")
out_dir = os.path.join(work, "out")
with open(seq_path, "w") as f:
    json.dump({k: v[0] for k, v in cases.items()}, f)

r = subprocess.run(
    ["sbt", "-batch",
     f"runMain graft.DmlRunner {work}/warehouse {seq_path} {out_dir}"],
    capture_output=True, text=True, timeout=1800)
for line in r.stderr.splitlines():
    if "[dmlrunner]" in line:
        print(line)

n_pass = n_fail = 0
for name, (stmts, exp_rows, exp_changes) in sorted(cases.items()):
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
        got_rows = sorted(map(tuple,
            got[["probe", "k", "name", "amount"]].values.tolist()),
            key=row_sort_key)
        ch = pd.read_parquet(f"{out_dir}/{name}__changes")
        got_changes = sorted(map(tuple,
            ch[["change_version", "change_op", "n"]].values.tolist()))
        ok_rows = got_rows == exp_rows
        ok_ch = got_changes == exp_changes
        if ok_rows and ok_ch:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows_ok={ok_rows} changes_ok={ok_ch}")
            if not ok_rows:
                print(f"  got  {got_rows[:8]}...\n  want {exp_rows[:8]}...")
            if not ok_ch:
                print(f"  got  {got_changes}\n  want {exp_changes}")
            print("  stmts:")
            for s in stmts:
                print(f"    {s}")
    except Exception as e:
        n_fail += 1
        print(f"FAIL {name}: {type(e).__name__}: {e}")

print(f"\ndml fuzz: {n_pass} pass, {n_fail} fail (seed={seed})")
sys.exit(1 if n_fail else 0)
