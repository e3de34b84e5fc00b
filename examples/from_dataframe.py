"""Mirror of reference examples/from_dataframe.py: sum of North American
GDPs -> 20901884461056. Demonstrates the OpenAI-compatible provider with
an injected transport so the example runs offline; drop the transport=
argument (and export OPENAI_API_KEY) against the real API."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.sample_dataframe import dataframe

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.providers import OpenAILLM
from my_polars_ai_spark.sources.readers import from_records

spark = get_spark("example_from_dataframe")
df = from_records(spark, dataframe)

GENERATED = (
    "<startCode>\n"
    "df.filter(F.col('country').isin('United States', 'Canada'))"
    ".agg(F.sum('gdp')).collect()[0][0]\n"
    "<endCode>"
)


def offline_transport(url, headers, payload):
    """Stands in for api.openai.com; shape-compatible with the real API."""
    return {"choices": [{"message": {"content": GENERATED}}]}


llm = OpenAILLM(api_token="sk-offline-example", transport=offline_transport)
ai = SparkAI(llm=llm, enable_cache=False)
answer = ai.run(df, "Calculate the sum of the gdp of north american countries")
print(answer)
# Output: 20901884461056
assert answer == 20901884461056
