"""Mirror of reference examples/from_csv.py: load the loan-payments CSV
and ask "How many loans are from men and have been paid off?" -> 247.

Runs offline: FakeLLM supplies the PySpark the provider would generate.
Swap in OpenAILLM(api_token=...) from my_polars_ai_spark.engine.providers
for a live model.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data.loans import write_csv

from my_polars_ai_spark import SparkAI, get_spark
from my_polars_ai_spark.engine.llm import FakeLLM
from my_polars_ai_spark.sources.readers import from_csv

spark = get_spark("example_from_csv")
csv_path = write_csv(os.path.join(tempfile.gettempdir(), "loan_payments.csv"))
df = from_csv(spark, csv_path)

llm = FakeLLM(
    output="<startCode>\n"
    "df.filter((F.col('Gender') == 'male') & (F.col('loan_status') == 'PAIDOFF')).count()\n"
    "<endCode>"
)
ai = SparkAI(llm=llm, verbose=False, enable_cache=False)
answer = ai.run(df, "How many loans are from men and have been paid off?")
print(answer)
# Output: 247
assert answer == 247
