from .catalog import QUERIES, Query, query, spark_queries, oracle_sqls  # noqa: F401

# Importing the query modules registers them in QUERIES. ORDER MATTERS:
# the driver's per-round correctness file records the FIRST 50 queries in
# registration order, so the tiers are rotated round-to-round to get every
# query a driver-certified row. Round 3 front-loads the tiers that had no
# driver row in rounds 1-2 (tpch, streaming, extensions, analytics,
# robustness — 33 queries) plus the full llm tier (17) = exactly 50; the
# remaining 42 (flagship/relational/functions/joins/windows) were driver-
# green in CORRECTNESS_r01/r02 and stay covered by driver_sim + pytest.
from . import tpch  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import robustness  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import flagship  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import functions  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import windows  # noqa: F401,E402
