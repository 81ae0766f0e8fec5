from .catalog import QUERIES, Query, query, spark_queries, oracle_sqls  # noqa: F401

# Importing the query modules registers them in QUERIES.
from . import flagship  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import functions  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import robustness  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
