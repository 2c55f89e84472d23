"""Recursive-descent SQL parser → heavydb_tpu.sql.ast nodes.

Covers the HeavyDB-relevant SQL subset: SELECT (joins, group-by, having,
order-by, limit/offset, DISTINCT, UNION [ALL], subqueries in FROM/WHERE,
CASE, CAST, EXTRACT, IN, BETWEEN, LIKE/ILIKE, EXISTS, CTEs), DDL
(CREATE/DROP/RENAME TABLE, CTAS, CREATE VIEW), DML (INSERT VALUES/SELECT,
UPDATE, DELETE, TRUNCATE, COPY), EXPLAIN, SHOW.

Reference role: java/calcite HeavyDBParser (SQL dialect) — rebuilt natively.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from heavydb_tpu.errors import ParserError
from heavydb_tpu.sql import ast as A
from heavydb_tpu.sql.lexer import EOF, IDENT, NUMBER, OP, QIDENT, STRING, Token, tokenize

_RESERVED_STOP = {
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION",
    "EXCEPT", "INTERSECT", "ON", "JOIN", "INNER", "LEFT", "RIGHT", "FULL",
    "CROSS", "AND", "OR", "NOT", "AS", "WHEN", "THEN", "ELSE", "END", "BY",
    "ASC", "DESC", "NULLS", "USING", "SET", "VALUES", "SELECT", "INTO",
    "WITH", "CASE", "IS", "IN", "BETWEEN", "LIKE", "ILIKE", "EXISTS", "ALL",
    "DISTINCT", "OUTER", "NATURAL", "THEN", "ESCAPE",
}

_EXTRACT_FIELDS = {
    "YEAR", "QUARTER", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND",
    "MILLISECOND", "MICROSECOND", "NANOSECOND", "DOW", "ISODOW", "DOY",
    "EPOCH", "WEEK", "WEEK_SUNDAY", "WEEK_SATURDAY", "DATEEPOCH",
    "MILLENNIUM", "CENTURY", "DECADE",
}

_INTERVAL_UNITS = {"YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "WEEK",
                   "QUARTER", "MILLISECOND"}


class Parser:
    def __init__(self, sql: str):
        import re as _re

        # /*+ hint, hint(arg) */ comments (reference HeavyDB hint syntax)
        self.hints = {}
        for m in _re.finditer(r"/\*\+(.*?)\*/", sql, _re.S):
            for part in m.group(1).split(","):
                part = part.strip()
                if not part:
                    continue
                hm = _re.match(r"(\w+)\s*(?:\(([^)]*)\))?$", part)
                if hm:
                    self.hints[hm.group(1).lower()] = (
                        hm.group(2).strip() if hm.group(2) else True
                    )
        self.toks = tokenize(sql)
        self.pos = 0
        self.sql = sql

    # ---- token helpers ----
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind != EOF:
            self.pos += 1
        return t

    def at_kw(self, *kws: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == IDENT and t.upper in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, kw: str):
        if not self.eat_kw(kw):
            raise ParserError(f"expected {kw}, got {self.peek().value!r} at {self.peek().pos}")

    def at_op(self, *ops: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == OP and t.value in ops

    def eat_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.next()
            return True
        return False

    def expect_op(self, op: str):
        if not self.eat_op(op):
            raise ParserError(f"expected {op!r}, got {self.peek().value!r} at {self.peek().pos}")

    def ident(self) -> str:
        t = self.peek()
        if t.kind in (IDENT, QIDENT):
            self.next()
            return t.value
        raise ParserError(f"expected identifier, got {t.value!r} at {t.pos}")

    # ---- entry points ----
    def parse_statement(self) -> A.Statement:
        stmt = self._statement()
        self.eat_op(";")
        if self.peek().kind != EOF:
            raise ParserError(f"trailing input at {self.peek().pos}: {self.peek().value!r}")
        return stmt

    def parse_statements(self) -> List[A.Statement]:
        out = []
        while self.peek().kind != EOF:
            out.append(self._statement())
            while self.eat_op(";"):
                pass
        return out

    # ---- statements ----
    def _statement(self) -> A.Statement:
        t = self.peek()
        if t.kind != IDENT:
            raise ParserError(f"expected statement, got {t.value!r}")
        kw = t.upper
        if kw in ("SELECT", "WITH") or self.at_op("("):
            return self.parse_select()
        if kw == "CREATE":
            return self._create()
        if kw == "DROP":
            return self._drop()
        if kw == "ALTER":
            return self._alter()
        if kw == "INSERT":
            return self._insert()
        if kw == "UPDATE":
            return self._update()
        if kw == "DELETE":
            return self._delete()
        if kw == "TRUNCATE":
            self.next()
            self.eat_kw("TABLE")
            return A.TruncateTable(self.ident())
        if kw == "COPY":
            return self._copy()
        if kw == "EXPLAIN":
            self.next()
            kind = "PLAN"
            if self.eat_kw("CALCITE"):
                kind = "CALCITE"
            elif self.eat_kw("OPTIMIZED"):
                kind = "OPTIMIZED"
            return A.Explain(self._statement(), kind)
        if kw == "SHOW":
            self.next()
            if self.eat_kw("TABLES"):
                return A.ShowTables()
            if self.eat_kw("USERS"):
                return A.ShowUsers()
            if self.eat_kw("ROLES"):
                return A.ShowRoles()
            if self.eat_kw("SERVERS"):
                return A.ShowServers()
            if self.eat_kw("FUNCTIONS"):
                return A.ShowFunctions(False)
            if self.eat_kw("TABLE"):
                if self.eat_kw("DETAILS"):
                    names = []
                    if self.peek().kind in (IDENT, QIDENT):
                        names.append(self.ident())
                        while self.eat_op(","):
                            names.append(self.ident())
                    return A.ShowTableDetails(tuple(names))
                self.expect_kw("FUNCTIONS")
                return A.ShowFunctions(True)
            if self.eat_kw("CREATE"):
                self.expect_kw("TABLE")
                return A.ShowCreateTable(self.ident())
            if self.eat_kw("USER"):
                self.expect_kw("SESSIONS")
                return A.ShowUserSessions()
            if self.eat_kw("QUERIES"):
                return A.ShowQueries()
            if self.eat_kw("POLICIES"):
                return A.ShowPolicies(self.ident(), effective=False)
            if self.eat_kw("ALL"):
                self.expect_kw("POLICIES")
                return A.ShowPolicies(self.ident(), effective=True)
            raise ParserError(f"unsupported SHOW at {t.pos}")
        if kw == "COMMENT":
            # COMMENT ON TABLE t IS '...'|NULL ; COMMENT ON COLUMN t.c IS …
            # (reference ddlParser.ftl:1156)
            self.next()
            self.expect_kw("ON")
            if self.eat_kw("COLUMN"):
                tbl = self.ident()
                self.expect_op(".")
                col = self.ident()
                self.expect_kw("IS")
                return A.CommentOn("COLUMN", tbl, col, self._comment_text())
            self.expect_kw("TABLE")
            tbl = self.ident()
            self.expect_kw("IS")
            return A.CommentOn("TABLE", tbl, None, self._comment_text())
        if kw in ("GRANT", "REVOKE"):
            return self._grant_revoke(kw == "REVOKE")
        if kw in ("DESCRIBE", "DESC"):
            self.next()
            return A.DescribeTable(self.ident())
        if kw == "REFRESH":
            self.next()
            self.expect_kw("FOREIGN")
            self.expect_kw("TABLES")
            tables = [self.ident()]
            while self.eat_op(","):
                tables.append(self.ident())
            opts = self._with_options()
            evict = bool(opts.get("evict", False))
            return A.RefreshForeignTables(tables, evict)
        if kw == "KILL":
            self.next()
            self.expect_kw("QUERY")
            tk = self.next()
            return A.KillQuery(str(tk.value).strip("'"))
        if kw == "VALIDATE":
            self.next()
            return A.ValidateStmt()
        if kw == "OPTIMIZE":
            self.next()
            self.expect_kw("TABLE")
            return A.OptimizeTable(self.ident())
        if kw == "DUMP":
            self.next()
            self.expect_kw("TABLE")
            name = self.ident()
            self.expect_kw("TO")
            return A.DumpTable(name, self.next().value)
        if kw == "RESTORE":
            self.next()
            self.expect_kw("TABLE")
            name = self.ident()
            self.expect_kw("FROM")
            return A.RestoreTable(name, self.next().value)
        raise ParserError(f"unsupported statement {t.value!r} at {t.pos}")

    def _comment_text(self):
        if self.eat_kw("NULL"):
            return None
        tk = self.next()
        if tk.kind != STRING:
            raise ParserError(f"expected string or NULL at {tk.pos}")
        return tk.value

    def _user_options(self) -> dict:
        opts = {}
        if self.eat_op("("):
            while True:
                key = self.ident().lower()
                self.expect_op("=")
                tv = self.next()
                val = tv.value
                if isinstance(val, str) and val.lower() in ("true", "false"):
                    val = val.lower() == "true"
                opts[key] = val
                if not self.eat_op(","):
                    break
            self.expect_op(")")
        return opts

    def _create(self) -> A.Statement:
        self.expect_kw("CREATE")
        temporary = self.eat_kw("TEMPORARY") or self.eat_kw("TEMP")
        if self.eat_kw("USER"):
            name = self.ident()
            return A.CreateUser(name, self._user_options())
        if self.eat_kw("ROLE"):
            return A.CreateRole(self.ident())
        if self.eat_kw("POLICY"):
            # CREATE POLICY ON COLUMN t.c TO grantee VALUES (...) —
            # reference ddlParser.ftl SqlCreatePolicy
            self.expect_kw("ON")
            self.expect_kw("COLUMN")
            tbl = self.ident()
            self.expect_op(".")
            col = self.ident()
            self.expect_kw("TO")
            grantee = self.ident()
            self.expect_kw("VALUES")
            self.expect_op("(")
            vals = [self._policy_literal()]
            while self.eat_op(","):
                vals.append(self._policy_literal())
            self.expect_op(")")
            return A.CreatePolicy(tbl, col, grantee, tuple(vals))
        if self.eat_kw("VIEW"):
            if_not_exists = self._if_not_exists()
            name = self.ident()
            self.expect_kw("AS")
            return A.CreateView(name, self.parse_select(), if_not_exists)
        if self.eat_kw("SERVER"):
            if_not_exists = self._if_not_exists()
            name = self.ident()
            self.expect_kw("FOREIGN")
            self.expect_kw("DATA")
            self.expect_kw("WRAPPER")
            wrapper = self.ident()
            opts = self._with_options()
            return A.CreateServer(name, wrapper, opts, if_not_exists)
        if self.eat_kw("FOREIGN"):
            self.expect_kw("TABLE")
            if_not_exists = self._if_not_exists()
            name = self.ident()
            st = A.CreateForeignTable(name, if_not_exists=if_not_exists)
            if self.at_op("("):
                self.expect_op("(")
                while True:
                    cname = self.ident()
                    tn = self._type_name()
                    if self.eat_kw("NOT"):
                        self.expect_kw("NULL")
                        tn.not_null = True
                    st.columns.append(A.ColumnDef(cname, tn, None))
                    if not self.eat_op(","):
                        break
                self.expect_op(")")
            self.expect_kw("SERVER")
            st.server = self.ident()
            st.options = self._with_options()
            return st
        self.expect_kw("TABLE")
        if_not_exists = self._if_not_exists()
        name = self.ident()
        stmt = A.CreateTable(name, if_not_exists=if_not_exists, temporary=temporary)
        if self.at_op("("):
            self.expect_op("(")
            while True:
                if self.at_kw("SHARD") :
                    self.next()
                    self.expect_kw("KEY")
                    self.expect_op("(")
                    stmt.shard_key = self.ident()
                    self.expect_op(")")
                    if not self.eat_op(","):
                        break
                    continue
                cname = self.ident()
                tn = self._type_name()
                default = None
                while True:
                    if self.eat_kw("NOT"):
                        self.expect_kw("NULL")
                        tn.not_null = True
                    elif self.eat_kw("DEFAULT"):
                        default = self.parse_expr()
                    elif self.eat_kw("ENCODING"):
                        enc = self.ident().upper()
                        p = 0
                        if self.eat_op("("):
                            p = int(self.next().value)
                            self.expect_op(")")
                        tn.encoding = enc
                        tn.encoding_param = p
                    else:
                        break
                stmt.columns.append(A.ColumnDef(cname, tn, default))
                if not self.eat_op(","):
                    break
            self.expect_op(")")
        if self.at_kw("WITH"):
            stmt.options = self._with_options()
        if self.eat_kw("AS"):
            stmt.as_select = self.parse_select()
        if not stmt.columns and stmt.as_select is None:
            raise ParserError("CREATE TABLE needs a column list or AS SELECT")
        return stmt

    def _with_options(self) -> dict:
        opts = {}
        if self.eat_kw("WITH"):
            self.expect_op("(")
            while True:
                key = self.ident().lower()
                self.expect_op("=")
                tv = self.next()
                val = tv.value
                if tv.kind == NUMBER:
                    val = float(val) if "." in val else int(val)
                elif isinstance(val, str) and val.lower() in ("true", "false"):
                    val = val.lower() == "true"
                opts[key] = val
                if not self.eat_op(","):
                    break
            self.expect_op(")")
        return opts

    def _if_not_exists(self) -> bool:
        if self.eat_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            return True
        return False

    def _policy_literal(self):
        tk = self.next()
        if tk.kind == STRING:
            return tk.value
        if tk.kind == NUMBER:
            v = tk.value
            return float(v) if "." in v else int(v)
        raise ParserError(f"expected literal in POLICY VALUES at {tk.pos}")

    def _drop(self) -> A.Statement:
        self.expect_kw("DROP")
        if self.eat_kw("USER"):
            return A.DropUser(self.ident())
        if self.eat_kw("ROLE"):
            return A.DropRole(self.ident())
        if self.eat_kw("POLICY"):
            self.expect_kw("ON")
            self.expect_kw("COLUMN")
            tbl = self.ident()
            self.expect_op(".")
            col = self.ident()
            self.expect_kw("FROM")
            return A.DropPolicy(tbl, col, self.ident())
        if self.eat_kw("SERVER"):
            if_exists = False
            if self.eat_kw("IF"):
                self.expect_kw("EXISTS")
                if_exists = True
            return A.DropServer(self.ident(), if_exists)
        is_view = self.eat_kw("VIEW")
        if not is_view:
            self.expect_kw("TABLE")
        if_exists = False
        if self.eat_kw("IF"):
            self.expect_kw("EXISTS")
            if_exists = True
        name = self.ident()
        return A.DropView(name, if_exists) if is_view else A.DropTable(name, if_exists)

    def _alter(self) -> A.Statement:
        self.expect_kw("ALTER")
        if self.eat_kw("USER"):
            name = self.ident()
            return A.AlterUser(name, self._user_options())
        if self.at_kw("SYSTEM", "SESSION"):
            scope = self.next().upper
            self.expect_kw("SET")
            key = self.ident().lower()
            self.expect_op("=")
            tv = self.next()
            val = tv.value
            if tv.kind == NUMBER:
                val = float(val) if "." in val else int(val)
            elif isinstance(val, str) and val.lower() in ("true", "false",
                                                          "on", "off"):
                val = val.lower() in ("true", "on")
            return A.AlterSetting(scope, key, val)
        self.expect_kw("TABLE")
        table = self.ident()
        if self.eat_kw("RENAME"):
            if self.eat_kw("COLUMN"):
                old = self.ident()
                self.expect_kw("TO")
                return A.RenameColumn(table, old, self.ident())
            self.expect_kw("TO")
            return A.RenameTable(table, self.ident())
        if self.eat_kw("ADD"):
            self.eat_kw("COLUMN")
            cname = self.ident()
            tn = self._type_name()
            default = None
            while True:
                if self.eat_kw("NOT"):
                    self.expect_kw("NULL")
                    tn.not_null = True
                elif self.eat_kw("DEFAULT"):
                    default = self.parse_expr()
                elif self.eat_kw("ENCODING"):
                    self.ident()
                    if self.eat_op("("):
                        self.next()
                        self.expect_op(")")
                else:
                    break
            return A.AddColumn(table, A.ColumnDef(cname, tn, default))
        if self.eat_kw("DROP"):
            self.eat_kw("COLUMN")
            return A.DropColumn(table, self.ident())
        if self.eat_kw("ALTER"):
            # ALTER [COLUMN] c [SET DATA] TYPE <type> [NOT NULL] [ENCODING …]
            # (reference SqlAlterTable.java:68-70)
            self.eat_kw("COLUMN")
            cname = self.ident()
            if self.eat_kw("SET"):
                self.expect_kw("DATA")
            self.expect_kw("TYPE")
            tn = self._type_name()
            if self.eat_kw("NOT"):
                self.expect_kw("NULL")
                tn.not_null = True
            if self.eat_kw("ENCODING"):
                self.ident()
                if self.eat_op("("):
                    self.next()
                    self.expect_op(")")
            return A.AlterColumnType(table, cname, tn)
        raise ParserError(
            "expected RENAME, ADD, DROP or ALTER after ALTER TABLE")

    def _insert(self) -> A.Statement:
        self.expect_kw("INSERT")
        self.expect_kw("INTO")
        table = self.ident()
        columns = None
        if self.at_op("(") and not self.at_kw("SELECT", ahead=1):
            self.expect_op("(")
            columns = [self.ident()]
            while self.eat_op(","):
                columns.append(self.ident())
            self.expect_op(")")
        if self.at_kw("VALUES"):
            self.next()
            rows = []
            while True:
                self.expect_op("(")
                row = [self.parse_expr()]
                while self.eat_op(","):
                    row.append(self.parse_expr())
                self.expect_op(")")
                rows.append(row)
                if not self.eat_op(","):
                    break
            return A.InsertValues(table, columns, rows)
        return A.InsertSelect(table, columns, self.parse_select())

    def _update(self) -> A.Statement:
        self.expect_kw("UPDATE")
        table = self.ident()
        self.expect_kw("SET")
        assignments = []
        while True:
            col = self.ident()
            self.expect_op("=")
            assignments.append((col, self.parse_expr()))
            if not self.eat_op(","):
                break
        where = self.parse_expr() if self.eat_kw("WHERE") else None
        return A.Update(table, assignments, where)

    def _delete(self) -> A.Statement:
        self.expect_kw("DELETE")
        self.expect_kw("FROM")
        table = self.ident()
        where = self.parse_expr() if self.eat_kw("WHERE") else None
        return A.Delete(table, where)

    def _grant_revoke(self, revoke: bool) -> A.Statement:
        self.next()  # GRANT / REVOKE
        first = self.ident().upper()
        _PRIVS = {"SELECT", "INSERT", "UPDATE", "DELETE", "CREATE", "DROP", "ALL"}
        if first in _PRIVS:
            privs = [first]
            while self.eat_op(","):
                privs.append(self.ident().upper())
            self.expect_kw("ON")
            if self.eat_kw("TABLE"):
                obj = self.ident()
            elif self.eat_kw("DATABASE"):
                self.ident()
                obj = "*"
            else:
                obj = self.ident()
            self.expect_kw("FROM" if revoke else "TO")
            grantees = [self.ident()]
            while self.eat_op(","):
                grantees.append(self.ident())
            return A.GrantStmt(privs, obj, None, grantees, revoke)
        # role grant: GRANT role[, role] TO grantee[, ...]
        roles = [first]
        while self.eat_op(","):
            roles.append(self.ident())
        self.expect_kw("FROM" if revoke else "TO")
        grantees = [self.ident()]
        while self.eat_op(","):
            grantees.append(self.ident())
        return A.GrantStmt(None, None, roles, grantees, revoke)

    def _copy(self) -> A.Statement:
        self.expect_kw("COPY")
        if self.at_op("("):  # COPY (SELECT ...) TO 'path'
            self.expect_op("(")
            sel = self.parse_select()
            self.expect_op(")")
            self.expect_kw("TO")
            path = self.next().value
            return A.CopyTo(sel, path, self._copy_options())
        table = self.ident()
        self.expect_kw("FROM")
        path = self.next().value
        return A.CopyFrom(table, path, self._copy_options())

    def _copy_options(self) -> dict:
        opts = {}
        if self.eat_kw("WITH"):
            self.expect_op("(")
            while True:
                key = self.ident().lower()
                self.expect_op("=")
                tv = self.next()
                val = tv.value
                if tv.kind == NUMBER:
                    val = float(val) if "." in val else int(val)
                elif tv.kind == IDENT:
                    val = val.lower() == "true" if val.lower() in ("true", "false") else val
                opts[key] = val
                if not self.eat_op(","):
                    break
            self.expect_op(")")
        return opts

    # ---- type names ----
    def _type_name(self) -> A.TypeName:
        base = self.ident().upper()
        if base == "DOUBLE" and self.eat_kw("PRECISION"):
            pass
        if base == "GEOMETRY" and self.at_op("("):
            self.next()
            sub = self.ident().upper()
            srid = 0
            if self.eat_op(","):
                srid = int(self.next().value)
            self.expect_op(")")
            return A.TypeName(sub, (srid,) if srid else ())
        params: Tuple[int, ...] = ()
        if self.at_op("("):
            self.expect_op("(")
            ps = [int(self.next().value)]
            while self.eat_op(","):
                ps.append(int(self.next().value))
            self.expect_op(")")
            params = tuple(ps)
        is_array = False
        if self.at_op("["):
            self.next()
            if not self.at_op("]"):
                self.next()  # fixed-size hint, stored arrays are variable
            self.expect_op("]")
            is_array = True
        return A.TypeName(base, params, is_array)

    # ---- SELECT ----
    def parse_select(self) -> A.Select:
        ctes: List[Tuple[str, A.Select]] = []
        if self.eat_kw("WITH"):
            while True:
                name = self.ident()
                self.expect_kw("AS")
                self.expect_op("(")
                ctes.append((name, self.parse_select()))
                self.expect_op(")")
                if not self.eat_op(","):
                    break
        sel = self._select_core()
        sel.ctes = ctes
        while self.at_kw("UNION", "EXCEPT", "INTERSECT"):
            op = self.next().upper
            if self.eat_kw("ALL"):
                if op != "UNION":
                    raise ParserError(f"{op} ALL not supported")
                op = "UNION ALL"
            else:
                self.eat_kw("DISTINCT")
            rhs = self._select_core()
            sel.set_ops.append((op, rhs))
        # ORDER BY / LIMIT after set ops apply to the whole thing
        self._order_limit(sel)
        return sel

    def _select_core(self) -> A.Select:
        if self.eat_op("("):
            sel = self.parse_select()
            self.expect_op(")")
            return sel
        self.expect_kw("SELECT")
        sel = A.Select()
        if self.hints:
            sel.hints = dict(self.hints)
        if self.eat_kw("DISTINCT"):
            sel.distinct = True
        else:
            self.eat_kw("ALL")
        # projections
        while True:
            if self.at_op("*"):
                self.next()
                sel.projections.append((A.Star(), None))
            else:
                e = self.parse_expr()
                alias = None
                if self.eat_kw("AS"):
                    alias = self.ident()
                elif self.peek().kind in (IDENT, QIDENT) and self.peek().upper not in _RESERVED_STOP:
                    alias = self.ident()
                # t.* parsed as Identifier('t','*')? — handled in primary
                sel.projections.append((e, alias))
            if not self.eat_op(","):
                break
        if self.eat_kw("FROM"):
            sel.from_ = self._table_expr()
        if self.eat_kw("WHERE"):
            sel.where = self.parse_expr()
        if self.eat_kw("GROUP"):
            self.expect_kw("BY")
            if self.at_kw("ROLLUP") or self.at_kw("CUBE"):
                kind = self.next().upper
                self.expect_op("(")
                exprs = [self.parse_expr()]
                while self.eat_op(","):
                    exprs.append(self.parse_expr())
                self.expect_op(")")
                if kind == "ROLLUP":
                    sel.grouping_sets = [
                        exprs[:i] for i in range(len(exprs), -1, -1)
                    ]
                else:  # CUBE: all subsets
                    if len(exprs) > 4:
                        raise ParserError("CUBE supports up to 4 columns")
                    sets = []
                    for m in range(1 << len(exprs)):
                        sets.append(
                            [e for i, e in enumerate(exprs) if m >> i & 1]
                        )
                    sets.sort(key=len, reverse=True)
                    sel.grouping_sets = sets
            elif self.at_kw("GROUPING"):
                self.next()
                self.expect_kw("SETS")
                self.expect_op("(")
                sets = []
                while True:
                    self.expect_op("(")
                    cur = []
                    if not self.at_op(")"):
                        cur.append(self.parse_expr())
                        while self.eat_op(","):
                            cur.append(self.parse_expr())
                    self.expect_op(")")
                    sets.append(cur)
                    if not self.eat_op(","):
                        break
                self.expect_op(")")
                sel.grouping_sets = sets
            else:
                sel.group_by.append(self.parse_expr())
                while self.eat_op(","):
                    sel.group_by.append(self.parse_expr())
        if self.eat_kw("HAVING"):
            sel.having = self.parse_expr()
        # ORDER BY / LIMIT are parsed by parse_select so they attach to the
        # outermost select of a set-op chain
        return sel

    def _order_limit(self, sel: A.Select):
        if self.eat_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                e = self.parse_expr()
                asc = True
                if self.eat_kw("DESC"):
                    asc = False
                else:
                    self.eat_kw("ASC")
                nulls_first = None
                if self.eat_kw("NULLS"):
                    if self.eat_kw("FIRST"):
                        nulls_first = True
                    else:
                        self.expect_kw("LAST")
                        nulls_first = False
                sel.order_by.append(A.OrderItem(e, asc, nulls_first))
                if not self.eat_op(","):
                    break
        if self.eat_kw("LIMIT"):
            if self.eat_kw("ALL"):
                pass
            else:
                sel.limit = int(self.next().value)
        if self.eat_kw("OFFSET"):
            sel.offset = int(self.next().value)
            self.eat_kw("ROWS") or self.eat_kw("ROW")

    # ---- FROM clause ----
    def _table_expr(self) -> A.TableRef:
        left = self._table_primary()
        while True:
            if self.eat_op(","):
                right = self._table_primary()
                left = A.JoinRef(left, right, "CROSS", None)
                continue
            natural = self.eat_kw("NATURAL")
            kind = None
            if self.eat_kw("JOIN"):
                kind = "INNER"
            elif self.at_kw("INNER", "LEFT", "RIGHT", "FULL", "CROSS"):
                kw = self.next().upper
                self.eat_kw("OUTER")
                self.expect_kw("JOIN")
                kind = kw if kw != "FULL" else "FULL"
            else:
                if natural:
                    raise ParserError("NATURAL must be followed by JOIN")
                break
            right = self._table_primary()
            cond = None
            using = None
            if not natural and kind != "CROSS":
                if self.eat_kw("ON"):
                    cond = self.parse_expr()
                elif self.eat_kw("USING"):
                    self.expect_op("(")
                    using = [self.ident()]
                    while self.eat_op(","):
                        using.append(self.ident())
                    self.expect_op(")")
                else:
                    raise ParserError("JOIN requires ON or USING")
            if kind == "RIGHT":
                left, right = right, left
                kind = "LEFT"
            if natural:
                using = "NATURAL"
            left = A.JoinRef(left, right, kind, cond, using)
        return left

    def _table_primary(self) -> A.TableRef:
        if self.at_kw("TABLE") and self.at_op("(", ahead=1):
            self.next()
            self.expect_op("(")
            fname = self.ident()
            self.expect_op("(")
            args = []
            if not self.at_op(")"):
                while True:
                    if self.at_kw("CURSOR") and self.at_op("(", ahead=1):
                        self.next()
                        self.expect_op("(")
                        args.append(self.parse_select())
                        self.expect_op(")")
                    else:
                        # named args: name => value (HeavyDB style)
                        if (
                            self.peek().kind == IDENT
                            and self.at_op("=", ahead=1)
                            and self.peek(2).kind == OP
                            and self.peek(2).value == ">"
                        ):
                            self.next()
                            self.next()
                            self.next()
                        args.append(self.parse_expr())
                    if not self.eat_op(","):
                        break
            self.expect_op(")")
            self.expect_op(")")
            return A.TableFuncRef(fname, args, self._opt_alias())
        if self.at_op("("):
            self.expect_op("(")
            if self.at_kw("SELECT", "WITH") or self.at_op("("):
                sel = self.parse_select()
                self.expect_op(")")
                alias = self._opt_alias()
                return A.SubqueryRef(sel, alias)
            inner = self._table_expr()
            self.expect_op(")")
            return inner
        name = self.ident()
        alias = self._opt_alias()
        return A.NamedTable(name, alias)

    def _opt_alias(self) -> Optional[str]:
        if self.eat_kw("AS"):
            return self.ident()
        t = self.peek()
        if t.kind in (IDENT, QIDENT) and t.upper not in _RESERVED_STOP:
            return self.ident()
        return None

    # ---- expressions (precedence climbing) ----
    def parse_expr(self) -> A.Expr:
        return self._or_expr()

    def _or_expr(self) -> A.Expr:
        left = self._and_expr()
        while self.eat_kw("OR"):
            left = A.Binary("OR", left, self._and_expr())
        return left

    def _and_expr(self) -> A.Expr:
        left = self._not_expr()
        while self.eat_kw("AND"):
            left = A.Binary("AND", left, self._not_expr())
        return left

    def _not_expr(self) -> A.Expr:
        if self.eat_kw("NOT"):
            return A.Unary("NOT", self._not_expr())
        return self._comparison()

    def _comparison(self) -> A.Expr:
        left = self._additive()
        while True:
            if self.at_op("=", "<>", "!=", "<", "<=", ">", ">="):
                op = self.next().value
                if op == "!=":
                    op = "<>"
                if self.at_kw("ANY", "SOME", "ALL"):
                    quant = "ALL" if self.next().upper == "ALL" else "ANY"
                    left = A.QuantCmp(op, left, self._additive(), quant)
                    continue
                right = self._additive()
                left = A.Binary(op, left, right)
                continue
            if self.at_kw("IS"):
                self.next()
                negated = self.eat_kw("NOT")
                if self.eat_kw("NULL"):
                    left = A.IsNull(left, negated)
                elif self.eat_kw("TRUE"):
                    cmp_ = A.Binary("=", left, A.Literal(True, "bool"))
                    left = A.Unary("NOT", cmp_) if negated else cmp_
                elif self.eat_kw("FALSE"):
                    cmp_ = A.Binary("=", left, A.Literal(False, "bool"))
                    left = A.Unary("NOT", cmp_) if negated else cmp_
                else:
                    raise ParserError("expected NULL/TRUE/FALSE after IS")
                continue
            negated = False
            save = self.pos
            if self.eat_kw("NOT"):
                negated = True
            if self.eat_kw("BETWEEN"):
                low = self._additive()
                self.expect_kw("AND")
                high = self._additive()
                left = A.Between(left, low, high, negated)
                continue
            if self.eat_kw("IN"):
                self.expect_op("(")
                if self.at_kw("SELECT", "WITH"):
                    sub = self.parse_select()
                    self.expect_op(")")
                    left = A.InSubquery(left, sub, negated)
                else:
                    items = [self.parse_expr()]
                    while self.eat_op(","):
                        items.append(self.parse_expr())
                    self.expect_op(")")
                    left = A.InList(left, items, negated)
                continue
            if self.at_kw("LIKE", "ILIKE"):
                ilike = self.next().upper == "ILIKE"
                pattern = self._additive()
                escape = None
                if self.eat_kw("ESCAPE"):
                    escape = self._additive()
                left = A.Like(left, pattern, escape, negated, ilike)
                continue
            if negated:
                self.pos = save
            break
        return left

    def _additive(self) -> A.Expr:
        left = self._multiplicative()
        while True:
            if self.at_op("+", "-"):
                op = self.next().value
                left = A.Binary(op, left, self._multiplicative())
            elif self.at_op("||"):
                self.next()
                left = A.Binary("||", left, self._multiplicative())
            else:
                break
        return left

    def _multiplicative(self) -> A.Expr:
        left = self._unary()
        while self.at_op("*", "/", "%"):
            op = self.next().value
            left = A.Binary(op, left, self._unary())
        return left

    def _unary(self) -> A.Expr:
        if self.at_op("-"):
            self.next()
            e = self._unary()
            if isinstance(e, A.Literal) and e.kind in ("num_int", "num_float", "num_decimal"):
                return A.Literal(-e.value, e.kind, "-" + e.text)
            return A.Unary("-", e)
        if self.at_op("+"):
            self.next()
            return self._unary()
        return self._postfix()

    def _postfix(self) -> A.Expr:
        e = self._primary()
        while True:
            if self.eat_op("::"):
                e = A.Cast(e, self._type_name())
            elif self.at_op("["):
                self.next()
                idx = self.parse_expr()
                self.expect_op("]")
                e = A.Subscript(e, idx)
            else:
                break
        return e

    def _primary(self) -> A.Expr:
        t = self.peek()
        if t.kind == NUMBER:
            self.next()
            txt = t.value
            if "." in txt or "e" in txt or "E" in txt:
                if "e" in txt or "E" in txt:
                    return A.Literal(float(txt), "num_float", txt)
                return A.Literal(float(txt), "num_decimal", txt)
            return A.Literal(int(txt), "num_int", txt)
        if t.kind == STRING:
            self.next()
            return A.Literal(t.value, "string", t.value)
        if t.kind == OP and t.value == "{":
            self.next()
            items = []
            if not self.at_op("}"):
                items.append(self.parse_expr())
                while self.eat_op(","):
                    items.append(self.parse_expr())
            self.expect_op("}")
            return A.ArrayLiteral(items)
        if t.kind == OP and t.value == "(":
            self.next()
            if self.at_kw("SELECT", "WITH"):
                sub = self.parse_select()
                self.expect_op(")")
                return A.ScalarSubquery(sub)
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == QIDENT:
            return self._ident_or_call()
        if t.kind == IDENT:
            kw = t.upper
            if kw == "NULL":
                self.next()
                return A.Literal(None, "null", "NULL")
            if kw == "TRUE":
                self.next()
                return A.Literal(True, "bool", "TRUE")
            if kw == "FALSE":
                self.next()
                return A.Literal(False, "bool", "FALSE")
            if kw == "CASE":
                return self._case()
            if kw in ("CAST", "TRY_CAST") and self.at_op("(", ahead=1):
                self.next()
                self.expect_op("(")
                e = self.parse_expr()
                self.expect_kw("AS")
                tn = self._type_name()
                self.expect_op(")")
                return A.Cast(e, tn, try_=(kw == "TRY_CAST"))
            if kw == "EXTRACT" and self.at_op("(", ahead=1):
                self.next()
                self.expect_op("(")
                fld = self.ident().upper()
                if fld not in _EXTRACT_FIELDS:
                    raise ParserError(f"unknown EXTRACT field {fld}")
                self.expect_kw("FROM")
                e = self.parse_expr()
                self.expect_op(")")
                return A.ExtractExpr(fld, e)
            if kw == "INTERVAL":
                self.next()
                vt = self.next()
                if vt.kind == STRING:
                    val = A.Literal(int(vt.value), "num_int", vt.value)
                elif vt.kind == NUMBER:
                    val = A.Literal(int(vt.value), "num_int", vt.value)
                else:
                    raise ParserError("expected INTERVAL value")
                unit = self.ident().upper().rstrip("S")
                if unit not in _INTERVAL_UNITS:
                    raise ParserError(f"unknown INTERVAL unit {unit}")
                return A.IntervalLit(val, unit)
            if kw == "EXISTS" and self.at_op("(", ahead=1):
                self.next()
                self.expect_op("(")
                sub = self.parse_select()
                self.expect_op(")")
                return A.Exists(sub)
            if kw in _RESERVED_STOP:
                # LEFT/RIGHT are also SQL string functions when called:
                # LEFT(s, n) / RIGHT(s, n)
                if kw in ("LEFT", "RIGHT") and self.at_op("(", ahead=1):
                    pass  # fall through to the function-call path below
                else:
                    raise ParserError(
                        f"unexpected keyword {t.value!r} at {t.pos}"
                    )
            if kw == "ARRAY" and self.at_op("[", ahead=1):
                self.next()
                self.next()
                items = []
                if not self.at_op("]"):
                    items.append(self.parse_expr())
                    while self.eat_op(","):
                        items.append(self.parse_expr())
                self.expect_op("]")
                return A.ArrayLiteral(items)
            if kw == "DATE" and self.peek(1).kind == STRING:
                self.next()
                s = self.next().value
                return A.Cast(A.Literal(s, "string", s), A.TypeName("DATE"))
            if kw == "TIMESTAMP" and self.peek(1).kind == STRING:
                self.next()
                s = self.next().value
                return A.Cast(A.Literal(s, "string", s), A.TypeName("TIMESTAMP"))
            if (
                kw == "TIMESTAMP"
                and self.at_op("(", ahead=1)
                and self.peek(2).kind == NUMBER
                and self.at_op(")", ahead=3)
                and self.peek(4).kind == STRING
            ):
                # TIMESTAMP(0) '1996-07-26 16:30:06'
                self.next()
                self.next()
                prec = int(self.next().value)
                self.next()
                s = self.next().value
                return A.Cast(
                    A.Literal(s, "string", s), A.TypeName("TIMESTAMP", (prec,))
                )
            if kw == "TIME" and self.peek(1).kind == STRING:
                self.next()
                s = self.next().value
                return A.Cast(A.Literal(s, "string", s), A.TypeName("TIME"))
            return self._ident_or_call()
        raise ParserError(f"unexpected token {t.value!r} at {t.pos}")

    def _ident_or_call(self) -> A.Expr:
        name = self.ident()
        if self.at_op("("):
            return self._call(name)
        parts = [name]
        while self.at_op(".") :
            if self.peek(1).kind == OP and self.peek(1).value == "*":
                self.next()
                self.next()
                return A.Star(table=parts[-1])
            self.next()
            parts.append(self.ident())
        return A.Identifier(tuple(parts))

    def _call(self, name: str) -> A.Expr:
        fname = name.upper()
        self.expect_op("(")
        if fname == "POSITION":
            # POSITION(substr IN str) — IN is part of the syntax, not a
            # membership test
            sub = self._additive()
            self.expect_kw("IN")
            src = self.parse_expr()
            self.expect_op(")")
            return A.FuncCall("POSITION", [src, sub])
        if fname == "OVERLAY" and not self.at_op(")"):
            # standard OVERLAY(str PLACING repl FROM pos [FOR len])
            first = self.parse_expr()
            if self.eat_kw("PLACING"):
                repl = self.parse_expr()
                self.expect_kw("FROM")
                pos = self.parse_expr()
                args = [first, repl, pos]
                if self.eat_kw("FOR"):
                    args.append(self.parse_expr())
                self.expect_op(")")
                return A.FuncCall("OVERLAY", args)
            args = [first]
            while self.eat_op(","):
                args.append(self.parse_expr())
            self.expect_op(")")
            return A.FuncCall("OVERLAY", args)
        if fname in ("SUBSTRING", "SUBSTR") and not self.at_op(")"):
            # standard SUBSTRING(str FROM pos [FOR len])
            first = self.parse_expr()
            if self.eat_kw("FROM"):
                args = [first, self.parse_expr()]
                if self.eat_kw("FOR"):
                    args.append(self.parse_expr())
                self.expect_op(")")
                return A.FuncCall(fname, args)
            args = [first]
            while self.eat_op(","):
                args.append(self.parse_expr())
            self.expect_op(")")
            return A.FuncCall(fname, args)
        fc = A.FuncCall(fname)
        if self.at_op("*"):
            self.next()
            fc.star = True
        elif not self.at_op(")"):
            if self.eat_kw("DISTINCT"):
                fc.distinct = True
            else:
                self.eat_kw("ALL")
            fc.args.append(self.parse_expr())
            while self.eat_op(","):
                fc.args.append(self.parse_expr())
        self.expect_op(")")
        ignore_nulls = False
        if self.eat_kw("IGNORE"):
            self.expect_kw("NULLS")
            ignore_nulls = True
        elif self.eat_kw("RESPECT"):
            self.expect_kw("NULLS")
        if self.at_kw("OVER"):
            self.next()
            self.expect_op("(")
            spec = A.WindowSpec()
            if self.eat_kw("PARTITION"):
                self.expect_kw("BY")
                spec.partition_by.append(self.parse_expr())
                while self.eat_op(","):
                    spec.partition_by.append(self.parse_expr())
            if self.eat_kw("ORDER"):
                self.expect_kw("BY")
                while True:
                    e = self.parse_expr()
                    asc = True
                    if self.eat_kw("DESC"):
                        asc = False
                    else:
                        self.eat_kw("ASC")
                    nf = None
                    if self.eat_kw("NULLS"):
                        nf = self.eat_kw("FIRST")
                        if not nf:
                            self.expect_kw("LAST")
                            nf = False
                    spec.order_by.append(A.OrderItem(e, asc, nf))
                    if not self.eat_op(","):
                        break
            if self.at_kw("ROWS", "RANGE"):
                unit = self.next().upper
                if self.eat_kw("BETWEEN"):
                    b1 = self._frame_bound()
                    self.expect_kw("AND")
                    b2 = self._frame_bound()
                else:
                    b1 = self._frame_bound()
                    b2 = ("CR",)
                spec.frame = (unit, b1, b2)
            self.expect_op(")")
            return A.WindowFuncCall(fc, spec, ignore_nulls)
        if ignore_nulls:
            raise ParserError("IGNORE NULLS requires an OVER clause")
        return fc

    def _frame_bound(self) -> tuple:
        """UNBOUNDED PRECEDING/FOLLOWING | CURRENT ROW | <n> PRECEDING/
        FOLLOWING → ("UP",)/("UF",)/("CR",)/("P", n)/("F", n)."""
        if self.eat_kw("UNBOUNDED"):
            if self.eat_kw("PRECEDING"):
                return ("UP",)
            self.expect_kw("FOLLOWING")
            return ("UF",)
        if self.eat_kw("CURRENT"):
            self.expect_kw("ROW")
            return ("CR",)
        t = self.next()
        try:
            nv = int(t.value)
        except ValueError:
            raise ParserError(
                f"expected frame bound, got {t.value!r} at {t.pos}"
            )
        if nv < 0:
            raise ParserError(f"negative frame offset at {t.pos}")
        if self.eat_kw("PRECEDING"):
            return ("P", nv)
        self.expect_kw("FOLLOWING")
        return ("F", nv)

    def _case(self) -> A.Expr:
        self.expect_kw("CASE")
        operand = None
        if not self.at_kw("WHEN"):
            operand = self.parse_expr()
        whens = []
        while self.eat_kw("WHEN"):
            cond = self.parse_expr()
            self.expect_kw("THEN")
            res = self.parse_expr()
            if operand is not None:
                cond = A.Binary("=", operand, cond)
            whens.append((cond, res))
        else_ = None
        if self.eat_kw("ELSE"):
            else_ = self.parse_expr()
        self.expect_kw("END")
        if not whens:
            raise ParserError("CASE requires at least one WHEN")
        return A.CaseWhen(whens, else_)


def parse(sql: str) -> A.Statement:
    return Parser(sql).parse_statement()


def parse_many(sql: str) -> List[A.Statement]:
    return Parser(sql).parse_statements()
