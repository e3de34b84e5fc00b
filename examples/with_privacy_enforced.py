"""Mirror of reference examples/with_privacy_enforced.py — with the flag
actually enforced (the reference accepted enforce_privacy and dropped
it): the LLM prompt carries column names and types only, never cell
values, and the example asserts it."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.sample_dataframe import dataframe

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_records

spark = get_spark("example_privacy")
df = from_records(spark, dataframe)

llm = FakeLLM(
    output="<startCode>\n"
    "df.filter(F.col('country').isin('United States', 'Canada'))"
    ".agg(F.sum('gdp')).collect()[0][0]\n"
    "<endCode>"
)
ai = SparkAI(llm=llm, enforce_privacy=True, enable_cache=False)
answer = ai.run(df, "Calculate the sum of the gdp of north american countries")
print(answer)
# Output: 20901884461056
assert answer == 20901884461056
# privacy contract: no cell value reached the LLM prompt
assert "United States" not in llm.last_prompt
assert "19294482071552" not in llm.last_prompt
assert "gdp: bigint" in llm.last_prompt
