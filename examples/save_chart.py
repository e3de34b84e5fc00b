"""Mirror of reference examples/save_chart.py: charts produced by
generated code are persisted under exports/charts/{prompt_id}/chart.png.

The save instrumentation (plt.savefig injected before every plt.show) is
demonstrated unconditionally; the live render runs only when matplotlib
is installed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.sample_dataframe import dataframe

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.charts import add_save_chart
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_records

GENERATED = (
    "pdf = df.toPandas()\n"
    "plt.bar(pdf['country'], pdf['gdp'])\n"
    "plt.show()"
)

# 1) the instrumentation itself (always available)
instrumented = add_save_chart(GENERATED, prompt_id="example-chart")
print(instrumented)
assert "plt.savefig" in instrumented and "plt.show()" in instrumented

# 2) live render when matplotlib is installed
try:
    import matplotlib
except ImportError:
    print("matplotlib not installed — skipping the live render")
else:
    matplotlib.use("Agg")
    spark = get_spark("example_save_chart")
    df = from_records(spark, dataframe)
    llm = FakeLLM(
        output="<startCode>\nimport matplotlib.pyplot as plt\n" + GENERATED + "\n<endCode>"
    )
    ai = SparkAI(llm=llm, save_charts=True, enable_cache=False)
    ai.run(df, "Plot the histogram of countries showing for each the gdp")
    chart = os.path.join("exports", "charts", ai.last_prompt_id, "chart.png")
    print("chart saved:", chart)
    assert os.path.exists(chart)
