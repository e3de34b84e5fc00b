"""Named LLM providers (parity with the reference provider surface:
polarsai/__init__.py:165-195 langchain switch; llm/deprecated/openai.py,
azure_openai.py, starcoder.py, falcon.py, open_assistant.py,
google_palm.py direct HTTP clients).

All providers speak public HTTP APIs (OpenAI chat/completions wire format,
HuggingFace Inference API) through an injectable ``transport`` callable
``(url, headers, payload_dict) -> response_dict`` so tests run fully
offline; the default transport uses urllib (stdlib, no extra deps).

Security note: tokens come from constructor args or the conventional env
vars, are held on the instance only, and never appear in ``type``/repr.
"""

from __future__ import annotations

import json
import os
import urllib.request
from collections.abc import Callable

from my_polars_ai_spark.engine.exceptions import (
    APIKeyNotFoundError,
    BadImportError,
    MethodNotImplementedError,
)
from my_polars_ai_spark.engine.llm import LLM, FakeLLM, LangChainLLM

Transport = Callable[[str, dict, dict], dict]


def _default_transport(url: str, headers: dict, payload: dict) -> dict:
    """POST JSON, parse JSON (urllib; swapped out in tests)."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:  # noqa: S310 (https API URL)
        return json.loads(resp.read().decode("utf-8"))


class OpenAILLM(LLM):
    """OpenAI-compatible chat-completions provider (reference
    llm/deprecated/openai.py surface, re-expressed against the modern
    /v1/chat/completions wire format). ``api_base`` makes it work with
    any OpenAI-compatible server (vLLM, llama.cpp server, proxies)."""

    def __init__(
        self,
        api_token: str | None = None,
        model: str = "gpt-4o-mini",
        api_base: str = "https://api.openai.com/v1",
        temperature: float = 0.0,
        max_tokens: int = 1024,
        transport: Transport | None = None,
        **params,
    ):
        self.api_token = api_token or os.getenv("OPENAI_API_KEY")
        if not self.api_token:
            raise APIKeyNotFoundError("OpenAI API key is required (api_token or OPENAI_API_KEY)")
        self.model = model
        self.api_base = api_base.rstrip("/")
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.params = params
        self._transport = transport or _default_transport

    @property
    def type(self) -> str:
        return "openai"

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.api_token}"}

    def _url(self) -> str:
        return f"{self.api_base}/chat/completions"

    def predict(self, text: str) -> str:
        payload = {
            "model": self.model,
            "messages": [{"role": "user", "content": text}],
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
            **self.params,
        }
        response = self._transport(self._url(), self._headers(), payload)
        return response["choices"][0]["message"]["content"]


class AzureOpenAILLM(OpenAILLM):
    """Azure-hosted OpenAI deployment (reference llm/deprecated/
    azure_openai.py surface): deployment-scoped URL + api-key header."""

    def __init__(
        self,
        api_token: str | None = None,
        api_base: str | None = None,
        api_version: str = "2024-02-01",
        deployment_name: str | None = None,
        **kwargs,
    ):
        api_token = api_token or os.getenv("AZURE_OPENAI_API_KEY")
        api_base = api_base or os.getenv("AZURE_OPENAI_ENDPOINT")
        if not api_base:
            raise APIKeyNotFoundError(
                "Azure endpoint is required (api_base or AZURE_OPENAI_ENDPOINT)"
            )
        if not deployment_name:
            raise APIKeyNotFoundError("deployment_name is required for Azure OpenAI")
        super().__init__(api_token=api_token, api_base=api_base, **kwargs)
        self.api_version = api_version
        self.deployment_name = deployment_name

    @property
    def type(self) -> str:
        return "azure-openai"

    def _headers(self) -> dict:
        return {"api-key": self.api_token}

    def _url(self) -> str:
        return (
            f"{self.api_base}/openai/deployments/{self.deployment_name}"
            f"/chat/completions?api-version={self.api_version}"
        )


class HuggingFaceTextGenLLM(LLM):
    """HuggingFace Inference API text-generation provider (reference
    llm/base.py HuggingFaceLLM surface; Starcoder/Falcon below pin the
    public model URLs exactly as the reference did)."""

    _api_url: str = ""
    _type: str = "huggingface"

    def __init__(
        self,
        api_token: str | None = None,
        api_url: str | None = None,
        max_new_tokens: int = 1024,
        transport: Transport | None = None,
    ):
        self.api_token = api_token or os.getenv("HF_TOKEN") or os.getenv(
            "HUGGINGFACE_API_KEY"
        )
        if not self.api_token:
            raise APIKeyNotFoundError("HuggingFace API token is required (api_token or HF_TOKEN)")
        if api_url:
            self._api_url = api_url
        if not self._api_url:
            raise MethodNotImplementedError("api_url (or a model subclass) is required")
        self.max_new_tokens = max_new_tokens
        self._transport = transport or _default_transport

    @property
    def type(self) -> str:
        return self._type

    def predict(self, text: str) -> str:
        payload = {
            "inputs": text,
            "parameters": {"max_new_tokens": self.max_new_tokens, "return_full_text": False},
        }
        response = self._transport(
            self._api_url, {"Authorization": f"Bearer {self.api_token}"}, payload
        )
        if isinstance(response, list):
            response = response[0]
        return response["generated_text"]


class StarcoderLLM(HuggingFaceTextGenLLM):
    """Starcoder via HF Inference API (reference llm/deprecated/starcoder.py)."""

    _api_url = "https://api-inference.huggingface.co/models/bigcode/starcoder"
    _type = "starcoder"


class FalconLLM(HuggingFaceTextGenLLM):
    """Falcon-7B-Instruct via HF Inference API (reference llm/deprecated/falcon.py)."""

    _api_url = "https://api-inference.huggingface.co/models/tiiuae/falcon-7b-instruct"
    _type = "falcon"


class OpenAssistantLLM(HuggingFaceTextGenLLM):
    """OpenAssistant pythia-12b via HF Inference API (reference
    llm/deprecated/open_assistant.py — same HuggingFaceLLM shape with
    the model URL pinned)."""

    _api_url = (
        "https://api-inference.huggingface.co/models/"
        "OpenAssistant/oasst-sft-1-pythia-12b"
    )
    _type = "open-assistant"


class GooglePalmLLM(LLM):
    """Google PaLM text completion (reference llm/deprecated/
    google_palm.py BaseGoogle/GooglePalm surface), re-expressed against
    the public Generative Language REST API (models/text-bison-001
    :generateText) through the same injectable transport as every other
    provider. Parameter validation mirrors the reference's
    ``_validate`` ranges; the Vertex-hosted variant stays behind
    ``load_llm("GoogleVertexAI")`` exactly as the reference split the
    two classes."""

    def __init__(
        self,
        api_token: str | None = None,
        model: str = "models/text-bison-001",
        temperature: float = 0.0,
        top_p: float = 0.8,
        top_k: int = 40,
        max_output_tokens: int = 1024,
        transport: Transport | None = None,
    ):
        self.api_token = api_token or os.getenv("GOOGLE_PALM_API_KEY")
        if not self.api_token:
            raise APIKeyNotFoundError(
                "Google PaLM API key is required (api_token or GOOGLE_PALM_API_KEY)"
            )
        if not model:
            raise ValueError("model is required.")
        if not 0 <= temperature <= 1:
            raise ValueError("temperature must be in the range [0.0, 1.0]")
        if not 0 <= top_p <= 1:
            raise ValueError("top_p must be in the range [0.0, 1.0]")
        if top_k <= 0:
            raise ValueError("top_k must be greater than zero")
        if max_output_tokens <= 0:
            raise ValueError("max_output_tokens must be greater than zero")
        self.model = model
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.max_output_tokens = max_output_tokens
        self._transport = transport or _default_transport

    @property
    def type(self) -> str:
        return "google-palm"

    def predict(self, text: str) -> str:
        # key travels in the x-goog-api-key header (the API's header
        # auth form), NEVER the URL query string — URLs end up in
        # proxy/access logs and debug traces; headers match how every
        # sibling provider carries its secret
        url = (
            f"https://generativelanguage.googleapis.com/v1beta3/{self.model}"
            ":generateText"
        )
        payload = {
            "prompt": {"text": text},
            "temperature": self.temperature,
            "topP": self.top_p,
            "topK": self.top_k,
            "maxOutputTokens": self.max_output_tokens,
        }
        response = self._transport(url, {"x-goog-api-key": self.api_token}, payload)
        candidates = response.get("candidates") or []
        if not candidates:
            raise ValueError("Google PaLM returned no candidates")
        return candidates[0]["output"]


def load_llm(llm_type: str, **options) -> LLM:
    """The reference's constructor switch (polarsai/__init__.py:165-195
    ``_load_llm``: LlamaCpp | OpenAI | SageMaker | Custom) re-expressed as
    a factory. LangChain-backed providers are optional imports — absent
    libraries raise the same BadImportError the reference used for an
    unrecognized llm, with an actionable message."""
    if llm_type == "OpenAI":
        return OpenAILLM(**options)
    if llm_type == "AzureOpenAI":
        return AzureOpenAILLM(**options)
    if llm_type == "Starcoder":
        return StarcoderLLM(**options)
    if llm_type == "Falcon":
        return FalconLLM(**options)
    if llm_type == "OpenAssistant":
        return OpenAssistantLLM(**options)
    if llm_type == "GooglePalm":
        return GooglePalmLLM(**options)
    if llm_type == "Fake":
        return FakeLLM(**options)
    if llm_type == "Custom":
        return LangChainLLM(options["langchain_llm"])
    if llm_type == "LlamaCpp":
        try:
            from langchain_community.llms import LlamaCpp  # type: ignore[import-not-found]
        except ImportError as exc:
            raise BadImportError("langchain_community (required for LlamaCpp)") from exc
        return LangChainLLM(LlamaCpp(model_path=options["model_path"], verbose=False))
    if llm_type == "SageMaker":
        try:
            from langchain_community.llms import SagemakerEndpoint  # type: ignore[import-not-found]
        except ImportError as exc:
            raise BadImportError("langchain_community (required for SageMaker)") from exc
        return LangChainLLM(SagemakerEndpoint(**options))
    if llm_type == "GoogleVertexAI":
        # reference examples/from_csv_vertexai.py surface
        try:
            from langchain_google_vertexai import VertexAI  # type: ignore[import-not-found]
        except ImportError as exc:
            raise BadImportError("langchain_google_vertexai (required for GoogleVertexAI)") from exc
        return LangChainLLM(VertexAI(**options))
    raise BadImportError(f"llm not recognized: {llm_type}")
