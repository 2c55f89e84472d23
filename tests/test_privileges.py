"""Users/roles/privileges (reference SysCatalog, DBObjectPrivilegesTest)."""

import pytest

import heavydb_tpu as hdt
from heavydb_tpu.storage.syscatalog import PermissionError_


@pytest.fixture()
def pdb(db):
    db.sql("CREATE TABLE t (x INT)")
    db.sql("INSERT INTO t VALUES (1)")
    db.sql("CREATE USER alice (password='secret')")
    db.sql("CREATE ROLE readers")
    return db


def test_user_lifecycle(pdb):
    users = [r[0] for r in pdb.sql("SHOW USERS").rows()]
    assert "alice" in users and "admin" in users
    assert pdb.syscatalog.check_login("alice", "secret")
    pdb.sql("ALTER USER alice (password='new')")
    assert not pdb.syscatalog.check_login("alice", "secret")
    assert pdb.syscatalog.check_login("alice", "new")
    pdb.sql("DROP USER alice")
    assert "alice" not in [r[0] for r in pdb.sql("SHOW USERS").rows()]


def test_privilege_enforcement(pdb):
    with pytest.raises(PermissionError_):
        pdb.sql("SELECT * FROM t", user="alice")
    pdb.sql("GRANT SELECT ON TABLE t TO alice")
    assert pdb.sql("SELECT count(*) FROM t", user="alice").scalar() == 1
    with pytest.raises(PermissionError_):
        pdb.sql("INSERT INTO t VALUES (2)", user="alice")
    pdb.sql("REVOKE SELECT ON TABLE t FROM alice")
    with pytest.raises(PermissionError_):
        pdb.sql("SELECT * FROM t", user="alice")


def test_role_grants(pdb):
    pdb.sql("GRANT SELECT ON TABLE t TO readers")
    pdb.sql("GRANT readers TO alice")
    assert pdb.sql("SELECT count(*) FROM t", user="alice").scalar() == 1
    pdb.sql("REVOKE readers FROM alice")
    with pytest.raises(PermissionError_):
        pdb.sql("SELECT * FROM t", user="alice")


def test_admin_bypasses(pdb):
    assert pdb.sql("SELECT count(*) FROM t", user="admin").scalar() == 1


def test_persistence(tmp_path):
    p = str(tmp_path / "db")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (x INT)")
    db.sql("CREATE USER bob (password='pw')")
    db.sql("GRANT SELECT ON TABLE t TO bob")
    db.sql("INSERT INTO t VALUES (1)")  # trigger persist
    del db
    db2 = hdt.connect(p)
    assert db2.syscatalog.check_login("bob", "pw")
    assert db2.sql("SELECT count(*) FROM t", user="bob").scalar() == 1


def test_server_auth(pdb):
    import threading

    from heavydb_tpu.client.client import Connection, ServerError
    from heavydb_tpu.server.server import serve

    srv = serve(port=0)
    srv.engine.db = pdb
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    try:
        with pytest.raises(ServerError):
            Connection(host, port, user="alice", password="wrong")
        with Connection(host, port, user="alice", password="secret") as c:
            pdb.sql("GRANT SELECT ON TABLE t TO alice")
            assert c.sql("SELECT count(*) FROM t").scalar() == 1
            with pytest.raises(ServerError):
                c.sql("DROP TABLE t")
    finally:
        srv.shutdown()
        srv.server_close()
