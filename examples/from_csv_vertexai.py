"""Mirror of reference examples/from_csv_vertexai.py: the loan-payments
CSV with the Google VertexAI provider -> "How many loans are from men
and have been paid off?" -> 247.

The VertexAI provider is an optional-dependency surface
(langchain_google_vertexai); when it isn't installed — as in this
container — the example demonstrates the documented BadImportError and
falls back to FakeLLM so the golden answer still runs offline. With the
library installed, the load_llm call below is the live path verbatim.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.loans import write_csv

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.exceptions import BadImportError
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.engine.providers import load_llm
from my_polars_ai_spark.sources.readers import from_csv

spark = get_spark("example_from_csv_vertexai")
csv_path = write_csv(os.path.join(tempfile.gettempdir(), "loan_payments.csv"))
df = from_csv(spark, csv_path)

try:
    llm = load_llm(
        "GoogleVertexAI",
        project="generative-ai-training",
        location="us-central1",
        model_name="text-bison@001",
    )
except BadImportError as exc:
    print(f"VertexAI provider unavailable offline ({exc}); using FakeLLM")
    # conversational=True phrases the result with a second LLM call —
    # queue both responses (code, then the phrasing)
    llm = FakeLLM(
        queue=[
            "<startCode>\n"
            "df.filter((F.col('Gender') == 'male') & (F.col('loan_status') == 'PAIDOFF')).count()\n"
            "<endCode>",
            "247 loans have been paid off by men.",
        ]
    )

ai = SparkAI(llm=llm, verbose=False, conversational=True, enable_cache=False)
answer = ai.run(df, "How many loans are from men and have been paid off?")
print(answer)
# Output: 247 (conversational wrapper phrases it; the count is the payload)
assert "247" in str(answer)
