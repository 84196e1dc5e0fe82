#!/usr/bin/env python3
"""Generate the genuine-SQLite test fixture for SQLiteWarehouseSpec.

Run once (re-run only if the spec's expectations change):
    python3 tools/make_sqlite_fixture.py

Writes src/test/resources/challenge_fixture.db with the stock sqlite3
library, shaped like the reference's challenge.db warehouse
(src/database/db_utils.py:29-65: session_sources / conversions /
session_costs) plus edge cases the page reader must survive:
  - enough rows that the table b-tree grows interior pages
  - a text payload far beyond one page -> overflow-page chain
  - NULLs, negative ints of every storage width, doubles, blobs
  - multi-byte UTF-8
  - an INTEGER PRIMARY KEY rowid-alias column (stored as NULL in records)
Deterministic: fixed seeds, fixed text, no timestamps of "now".
"""
import os
import sqlite3

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "challenge_fixture.db")


# The reference's warehouse DDL, verbatim (data/sql/challenge_db_create.sql:
# 6-48) — the fixture IS the reference's schema, including the table-level
# text PRIMARY KEYs (which make sqlite_master carry sqlite_autoindex rows the
# reader must skip) and the two tables the pipeline writes back into.
REFERENCE_DDL = """
CREATE TABLE IF NOT EXISTS conversions (
                                    conv_id text NOT NULL,
                                    user_id text NOT NULL,
                                    conv_date text NOT NULL,
                                    conv_time text NOT NULL,
                                    revenue real NOT NULL,
                                    PRIMARY KEY(conv_id)
                                );
CREATE TABLE IF NOT EXISTS session_costs (
                                    session_id text NOT NULL,
                                    cost real,
                                    PRIMARY KEY(session_id)
                                );
CREATE TABLE IF NOT EXISTS session_sources (
                                    session_id text NOT NULL,
                                    user_id text NOT NULL,
                                    event_date text NOT NULL,
                                    event_time text NOT NULL,
                                    channel_name text NOT NULL,
                                    holder_engagement INTEGER NOT NULL,
                                    closer_engagement INTEGER NOT NULL,
                                    impression_interaction INTEGER NOT NULL,
                                    PRIMARY KEY(session_id)
                                );
CREATE TABLE IF NOT EXISTS attribution_customer_journey (
                                    conv_id text NOT NULL,
                                    session_id text NOT NULL,
                                    ihc real NOT NULL,
                                    PRIMARY KEY(conv_id,session_id)
                                );
CREATE TABLE IF NOT EXISTS channel_reporting (
                            channel_name text NOT NULL,
                            date text NOT NULL,
                            cost real NOT NULL,
                            ihc real NOT NULL,
                            ihc_revenue real NOT NULL,
                            PRIMARY KEY(channel_name,date)
                        );
"""


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if os.path.exists(OUT):
        os.remove(OUT)
    con = sqlite3.connect(OUT)
    cur = con.cursor()
    cur.executescript(REFERENCE_DDL)
    # 3000 rows: at ~70 bytes/row this spans multiple leaf pages -> interior
    rows = [(f"s{i:05d}", f"u{i % 97:03d}", f"2023-0{1 + i % 9}-{1 + i % 28:02d}",
             f"{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}",
             ["google", "facebook", "email", "direct", "affiliate"][i % 5],
             i % 2, (i // 2) % 2, (i // 4) % 2)
            for i in range(3000)]
    cur.executemany("INSERT INTO session_sources VALUES (?,?,?,?,?,?,?,?)", rows)

    # revenue is NOT NULL in the reference DDL; the NULL-value decode cases
    # live in session_costs.cost (nullable there) and edge_cases
    cur.executemany("INSERT INTO conversions VALUES (?,?,?,?,?)", [
        ("c001", "u001", "2023-09-01", "10:00:00", 99.5),
        ("c002", "u002", "2023-09-02", "11:30:00", 0.0),
        ("c003", "u003", "2023-09-03", "12:45:00", 1250.75),
        ("c004", "müller-ü", "2023-09-04", "13:00:00", -12.25),
    ])

    cur.executemany("INSERT INTO session_costs VALUES (?,?)", [
        ("s00000", 1.5), ("s00001", None), ("s00002", 2.0 ** 40),
    ])
    # attribution_customer_journey / channel_reporting stay EMPTY: the
    # pipeline writes them; an empty rowid table is its own read edge case

    # edge-case table: every storage class, widths, rowid alias, overflow
    cur.execute("""CREATE TABLE edge_cases (
        id INTEGER PRIMARY KEY, i8 INTEGER, i16 INTEGER, i24 INTEGER,
        i32 INTEGER, i48 INTEGER, i64 INTEGER, f REAL, t TEXT, b BLOB)""")
    big_text = ("päge-överflöw-" * 1000)  # ~15 KB >> one 4 KiB page
    cur.executemany("INSERT INTO edge_cases VALUES (?,?,?,?,?,?,?,?,?,?)", [
        (1, -7, -300, -70000, -2000000000, -140737488355328, -9223372036854775808,
         3.5, "plain", b"\x00\x01\xfe\xff"),
        (2, 7, 300, 70000, 2000000000, 140737488355327, 9223372036854775807,
         -0.125, big_text, None),
        (3, None, None, None, None, None, None, None, None, None),
        (7, 0, 1, 2, 3, 4, 5, 6.0, "rowid-gap", b""),  # explicit rowid 7
    ])
    # a WITHOUT ROWID table stores rows in an INDEX-layout b-tree the
    # rowid reader must reject loudly (spec: "without rowid is a loud error")
    cur.execute("""CREATE TABLE wr_edge (
        k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID""")
    cur.execute("INSERT INTO wr_edge VALUES ('a', 1)")
    con.commit()
    con.close()
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")

    # second fixture: a UTF-16 database — the reader supports UTF-8 only
    # and must name the encoding in its rejection
    out16 = os.path.join(os.path.dirname(OUT), "utf16_fixture.db")
    if os.path.exists(out16):
        os.remove(out16)
    c16 = sqlite3.connect(out16)
    c16.execute("PRAGMA encoding = 'UTF-16'")
    c16.execute("CREATE TABLE t (a TEXT)")
    c16.execute("INSERT INTO t VALUES ('x')")
    c16.commit()
    c16.close()
    print(f"wrote {out16} ({os.path.getsize(out16)} bytes)")

    # third fixture: the INTEGER PRIMARY KEY rowid-alias quirk, both halves
    # (lang_createtable.html#rowid): a table-level single-column PK over an
    # INTEGER column aliases the rowid (even with DESC), while the INLINE
    # `INTEGER PRIMARY KEY DESC` spelling does NOT
    outq = os.path.join(os.path.dirname(OUT), "rowid_quirk_fixture.db")
    if os.path.exists(outq):
        os.remove(outq)
    cq = sqlite3.connect(outq)
    q = cq.cursor()
    q.execute("CREATE TABLE tbl_pk (id INTEGER, label TEXT, PRIMARY KEY (id))")
    q.executemany("INSERT INTO tbl_pk (id,label) VALUES (?,?)",
                  [(10, 'a'), (20, 'b'), (30, 'c')])
    q.execute("CREATE TABLE inline_desc (id INTEGER PRIMARY KEY DESC, label TEXT)")
    q.executemany("INSERT INTO inline_desc (id,label) VALUES (?,?)",
                  [(7, 'x'), (3, 'y')])
    q.execute("CREATE TABLE tbl_pk_desc (id INTEGER, label TEXT, PRIMARY KEY (id DESC))")
    q.executemany("INSERT INTO tbl_pk_desc (id,label) VALUES (?,?)",
                  [(5, 'p'), (9, 'q')])
    cq.commit()
    # ground truth recorded in SQLiteWarehouseSpec: tbl_pk / tbl_pk_desc
    # store id as NULL (alias), inline_desc stores id as a real value
    for t in ["tbl_pk", "inline_desc", "tbl_pk_desc"]:
        print(t, q.execute(f"SELECT rowid,* FROM {t}").fetchall())
    cq.close()
    print(f"wrote {outq} ({os.path.getsize(outq)} bytes)")

    # WAL-state fixtures (SQLiteWarehouseSpec "un-checkpointed WAL"):
    # 1. wal_pending: main file + sibling -wal snapshotted BEFORE the
    #    WAL-mode writer closes — the committed table exists ONLY in the
    #    WAL, so a page-level read of the main file alone would silently
    #    report an empty database; the reader must reject instead.
    # 2. wal_checkpointed: the same database after a clean close (sqlite
    #    checkpoints and deletes the -wal) — header write-version stays 2
    #    but every page is in the main file; must read normally.
    # 3. journal_pending: a plain db with a non-empty -journal sibling (a
    #    hot rollback journal) — must reject.
    import shutil
    res = os.path.dirname(OUT)
    tmp = os.path.join(res, "_walgen.db")
    for f in [tmp, tmp + "-wal", tmp + "-shm"]:
        if os.path.exists(f):
            os.remove(f)
    cw = sqlite3.connect(tmp)
    cw.execute("PRAGMA journal_mode=WAL")
    cw.execute("CREATE TABLE wal_rows (a INTEGER, b TEXT)")
    cw.execute("INSERT INTO wal_rows VALUES (1,'only-in-wal')")
    cw.commit()
    shutil.copy(tmp, os.path.join(res, "wal_pending_fixture.db"))
    shutil.copy(tmp + "-wal", os.path.join(res, "wal_pending_fixture.db-wal"))
    cw.close()
    for f in [tmp, tmp + "-wal", tmp + "-shm"]:
        if os.path.exists(f):
            os.remove(f)
    ck = sqlite3.connect(tmp)
    ck.execute("PRAGMA journal_mode=WAL")
    ck.execute("CREATE TABLE ck (a INTEGER, b TEXT)")
    ck.execute("INSERT INTO ck VALUES (7,'checkpointed')")
    ck.commit()
    ck.close()  # clean close checkpoints + removes the -wal
    os.replace(tmp, os.path.join(res, "wal_checkpointed_fixture.db"))
    cj = sqlite3.connect(tmp)
    cj.execute("CREATE TABLE t (a INTEGER)")
    cj.commit()
    cj.close()
    os.replace(tmp, os.path.join(res, "journal_pending_fixture.db"))
    with open(os.path.join(res, "journal_pending_fixture.db-journal"), "wb") as jf:
        jf.write(b"\xd9\xd5\x05\xf9 hot journal stub")
    print("wrote WAL-state fixtures (pending, checkpointed, hot journal)")

    # persist_journal: journal_mode=PERSIST leaves a non-empty -journal
    # with a ZEROED header after every clean commit — the db is consistent
    # and must be accepted (only the 0xd9d505f9 magic marks a hot journal)
    cp = sqlite3.connect(tmp)
    cp.execute("PRAGMA journal_mode=PERSIST")
    cp.execute("CREATE TABLE pj (a INTEGER, b TEXT)")
    cp.execute("INSERT INTO pj VALUES (3,'persist-ok')")
    cp.commit()
    cp.close()
    os.replace(tmp, os.path.join(res, "persist_journal_fixture.db"))
    os.replace(tmp + "-journal",
               os.path.join(res, "persist_journal_fixture.db-journal"))

    # ddl_edge: (a) whitespace inside PRIMARY KEY — sqlite_master stores
    # the DDL verbatim and the column still aliases the rowid; (b) an fts5
    # virtual table (type='table', rootpage=0) the reader must reject by
    # name, whose shadow tables remain ordinary readable rowid b-trees
    ce = sqlite3.connect(tmp)
    ce.execute("CREATE TABLE nl_pk (id INTEGER PRIMARY\n      KEY, label TEXT)")
    ce.executemany("INSERT INTO nl_pk (id,label) VALUES (?,?)",
                   [(100, 'nl-a'), (200, 'nl-b')])
    ce.execute("CREATE VIRTUAL TABLE vt USING fts5(content)")
    ce.execute("INSERT INTO vt VALUES ('hello world')")
    # literal_trap: the words PRIMARY KEY appearing only inside a DEFAULT
    # string literal and a CHECK expression — NOT a rowid alias; a stored
    # NULL must come back as NULL, never fabricated from the rowid
    ce.execute("CREATE TABLE literal_trap (n INTEGER DEFAULT 'primary\n key' "
               "CHECK (n IS NULL OR 'PRIMARY KEY' <> ''), label TEXT)")
    ce.execute("INSERT INTO literal_trap (n, label) VALUES (NULL, 'trap-null')")
    ce.execute("INSERT INTO literal_trap (n, label) VALUES (42, 'trap-42')")
    ce.commit()
    ce.close()
    os.replace(tmp, os.path.join(res, "ddl_edge_fixture.db"))
    print("wrote persist-journal + ddl-edge fixtures")


if __name__ == "__main__":
    main()
