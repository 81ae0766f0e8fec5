from .catalog import QUERIES, Query, query, spark_queries, oracle_sqls  # noqa: F401

# Importing the query modules registers them in QUERIES. ORDER MATTERS:
# the driver's per-round correctness file records the FIRST 50 queries in
# registration order, so the tiers are rotated round-to-round to get every
# query a driver-certified row. Round 5 front-loads the 42 whose driver
# rows are stale (flagship 2 / relational 15 / functions 10 / joins 9 /
# windows 6 — last certified r01/r02, code has changed since, and
# relational now carries the promoted approx_count_distinct oracle) plus
# streaming (5 — red in r04, fixed this round, must re-certify) plus
# analytics (3) = exactly 50. tpch/extensions/robustness/llm were all
# driver-green in CORRECTNESS_r04 and stay covered by driver_sim + pytest.
from . import flagship  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import functions  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import robustness  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
