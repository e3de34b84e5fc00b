"""Mirror of reference examples/show_chart.py: generated chart code runs
and displays via plt.show() — no save instrumentation when save_charts
is off (the live-display path, vs. save_chart.py's persisted path).

Runs offline: FakeLLM supplies the matplotlib code the provider would
generate; the Agg backend makes show() a no-op render.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.sample_dataframe import dataframe

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_records

GENERATED = (
    "import matplotlib.pyplot as plt\n"
    "pdf = df.toPandas()\n"
    "plt.bar(pdf['country'], pdf['gdp'])\n"
    "plt.show()"
)

try:
    import matplotlib
except ImportError:
    print("matplotlib not installed — skipping the live render")
else:
    matplotlib.use("Agg")
    spark = get_spark("example_show_chart")
    df = from_records(spark, dataframe)
    llm = FakeLLM(output="<startCode>\n" + GENERATED + "\n<endCode>")
    ai = SparkAI(llm=llm, save_charts=False, enable_cache=False)
    ai.run(
        df,
        "Plot the histogram of countries showing for each the gdp,"
        " using different colors for each bar",
    )
    # save_charts=False: the code ran verbatim — nothing written under
    # exports/charts/ for this prompt (contrast save_chart.py)
    chart = os.path.join("exports", "charts", ai.last_prompt_id, "chart.png")
    assert not os.path.exists(chart)
    print("chart displayed (Agg backend), not saved")
