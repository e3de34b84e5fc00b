"""Mirror of reference examples/from_dataframe_azure.py: the same GDP
question through an Azure OpenAI deployment (offline transport here; set
AZURE_OPENAI_API_KEY / AZURE_OPENAI_ENDPOINT and drop transport= for a
real deployment)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.sample_dataframe import dataframe

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.providers import AzureOpenAILLM
from my_polars_ai_spark.sources.readers import from_records

spark = get_spark("example_from_dataframe_azure")
df = from_records(spark, dataframe)

GENERATED = (
    "<startCode>\n"
    "df.filter(F.col('country').isin('United States', 'Canada'))"
    ".agg(F.sum('gdp')).collect()[0][0]\n"
    "<endCode>"
)

llm = AzureOpenAILLM(
    api_token="az-offline-example",
    api_base="https://your-resource-name.openai.azure.com",
    deployment_name="YOUR-MODEL-DEPLOYMENT-NAME",
    api_version="2024-02-01",
    transport=lambda url, headers, payload: {
        "choices": [{"message": {"content": GENERATED}}]
    },
)
ai = SparkAI(llm=llm, enable_cache=False)
answer = ai.run(df, "Calculate the sum of the gdp of north american countries")
print(answer)
# Output: 20901884461056
assert answer == 20901884461056
