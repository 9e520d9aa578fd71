"""ModelClient protocol + deterministic stub.

Everything LLM-shaped sits behind ``ModelClient`` (batch ``generate``).  The
sandbox default is ``VocabStubModel`` — a deterministic, content-addressed
fake that reads the paragraph back out of the *rendered prompt* (so the full
prompt-render → model → parse → align path is exercised end-to-end) and
answers in the reference's CoT exemplar format
``n. surface | True/False | explanation (TYPE)`` (reference
``utils.py:107-153`` consumes this).  ``OpenAIClient`` is a real
OpenAI-compatible HTTP client (reference ``models.py:10-52``) with batched
concurrent requests, token-bucket rate limiting and 429/5xx retry —
exercised end to end against an in-process mock server in tests.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

Chat = list[tuple[str, str]]


class ModelClient(Protocol):
    """Batch text-in/text-out model interface (one response per prompt).

    ``prompts`` items may be: a plain completion string, a ``Chat``
    transcript (``list[(content, role)]``), or a lazy
    ``kernels.prompts.CompletionPrompt`` (exposes ``.text``) — clients that
    need the rendered string call ``.text`` at request time, keeping the
    hot path free of per-sentence prefix copies.
    """

    def generate(self, prompts: list[str | Chat]) -> list[str]: ...


def _para_from_prompt(prompt: str | Chat) -> str:
    """Recover the paragraph from a rendered prompt.

    Completion prompts end with `` '{para}' \\nAnswer:`` (reference
    ``algorithms.py:188``); chat transcripts end with a user message
    ``\\nParagraph: {para} \\nAnswer:`` (``algorithms.py:212``).
    """
    if isinstance(prompt, str):
        tail = prompt.rfind(" \nAnswer:")
        if tail < 0:
            return ""
        body = prompt[:tail]
        if body.endswith("'"):
            # exemplar-mode prompts append " '{para}'" right after the
            # newline-terminated task block; paras are single lines, so
            # "\n '" is the unambiguous boundary (a bare rfind(" '") would
            # truncate paras containing quotes, e.g. tokenized "'s").
            start = body.rfind("\n '")
            return body[start + 3 : -1] if start >= 0 else body[2:-1]
        marker = body.rfind("\nParagraph: ")
        return body[marker + len("\nParagraph: ") :] if marker >= 0 else ""
    content = prompt[-1][0]
    if content.startswith("\nParagraph: ") and content.endswith(" \nAnswer:"):
        return content[len("\nParagraph: ") : -len(" \nAnswer:")]
    return ""


class VocabStubModel:
    """Deterministic mention detector over a fixed surface-form vocabulary.

    Greedy longest-match scan (up to ``max_words`` tokens) over the
    paragraph's space-split tokens.  Per (paragraph, token) it also emits
    deterministic False distractors — exercising the parser's per-entity
    True/False verification filter — and, at a small deterministic rate,
    a malformed explanation with no ``(TYPE)`` parens (exercising the
    aligner's drop path).  Pure function of its inputs: identical output at
    any parallelism level.
    """

    def __init__(
        self,
        vocab: dict[str, str],
        distractor_rate: float = 0.15,
        malformed_rate: float = 0.02,
        max_words: int = 4,
    ) -> None:
        self.vocab = dict(vocab)
        self.distractor_rate = distractor_rate
        self.malformed_rate = malformed_rate
        self.max_words = max_words

    @staticmethod
    def _chance(key: str, rate: float) -> bool:
        h = hashlib.blake2b(key.encode(), digest_size=4).digest()
        return int.from_bytes(h, "big") / 2**32 < rate

    def _first_word_widths(self) -> dict[str, list[int]]:
        """First token → descending widths of vocab surfaces starting with
        it; built lazily once so the scan only attempts joins that can hit."""
        cache = getattr(self, "_fww", None)
        if cache is None:
            cache = {}
            for surface in self.vocab:
                words = surface.split(" ")
                cache.setdefault(words[0], set()).add(len(words))
            cache = {
                w: sorted(ws, reverse=True) for w, ws in cache.items()
            }
            self._fww = cache
        return cache

    def _scan(self, para: str) -> list[tuple[str, str | None]]:
        """(surface, type|None) in sentence order; None marks a distractor."""
        fww = self._first_word_widths()
        tokens = para.split(" ")
        found: list[tuple[str, str | None]] = []
        i = 0
        while i < len(tokens):
            matched = None
            for width in fww.get(tokens[i], ()):
                if width > min(self.max_words, len(tokens) - i):
                    continue
                cand = tokens[i] if width == 1 else " ".join(tokens[i : i + width])
                if cand in self.vocab:
                    matched = (cand, width)
                    break
            if matched is not None:
                found.append((matched[0], self.vocab[matched[0]]))
                i += matched[1]
            else:
                tok = tokens[i]
                if (
                    len(tok) > 3
                    and tok.isalpha()
                    and self._chance(f"{para}\x00{i}\x00{tok}", self.distractor_rate)
                ):
                    found.append((tok, None))
                i += 1
        return found

    def _answer_for(self, para: str) -> str:
        lines = ["Answer:"]
        n = 1
        for surface, etype in self._scan(para):
            if etype is None:
                lines.append(f"{n}. {surface} | False | as it is not an entity")
            elif self._chance(f"mal\x00{para}\x00{surface}", self.malformed_rate):
                lines.append(f"{n}. {surface} | True | a known entity of type {etype}")
            else:
                lines.append(f"{n}. {surface} | True | {surface} is a known entity ({etype})")
            n += 1
        if n == 1:
            # No candidates: an unnumbered line the parser ignores.  (A bare
            # "1." would hit the reference parser's IndexError row-drop path,
            # reference utils.py:73 + run.py:43-44.)
            lines.append("None")
        return "\n".join(lines)

    # -- second-pass prompt kinds (type query / dispute / annotation) -----

    def _lower_vocab(self) -> dict[str, str]:
        cache = getattr(self, "_lv", None)
        if cache is None:
            cache = {k.lower(): v for k, v in self.vocab.items()}
            self._lv = cache
        return cache

    def _type_answer(self, text: str) -> str:
        """Answer ``Entity Phrase:`` type/dispute queries (reference
        ``algorithms.py:371-401`` consumers parse the first parens)."""
        seg = text.split("\nEntity Phrase: ", 1)[1]
        if ", Options: " in seg:
            phrase, _, opts = seg.partition(", Options: ")
            etype = self._lower_vocab().get(phrase.strip())
            if etype is None and "(" in opts and ")" in opts:
                etype = opts[opts.find("(") + 1 : opts.find(")")]
            if etype is None:
                return "unable to decide between the options"
            return f"the phrase is best typed as ({etype})"
        phrase = seg.split(" \nAnswer:", 1)[0].strip()
        etype = self._lower_vocab().get(phrase)
        if etype is None:
            # no parens → consumers take the -1 / fallback path
            return "the type of this phrase cannot be determined"
        return f"{phrase} is a known entity of type ({etype})"

    def _respond(self, prompt) -> str:
        from .kernels.prompts import CompletionPrompt

        if isinstance(prompt, CompletionPrompt):
            # lazy hot-path prompt: the paragraph is carried explicitly, no
            # 6 KB prefix materialization + reverse-parse per sentence
            return self._answer_for(prompt.para)
        text = prompt if isinstance(prompt, str) else prompt[-1][0]
        if "\nEntity Phrase: " in text:
            return self._type_answer(text)
        if "In one line explain why. \nAnswer:" in text:
            if "is not an entity because" in text:
                return " it is a common word with no distinct existence"
            return " it is a known named entity in this context "
        return self._answer_for(_para_from_prompt(prompt))

    def generate(self, prompts: list[str | Chat]) -> list[str]:
        return [self._respond(p) for p in prompts]


class RateLimiter:
    """Token-bucket request limiter (thread-safe).

    Replaces the reference's fixed ``time.sleep(seconds_per_query)`` pacing
    (reference ``models.py:13-15``, ``run.py:41-42``) with a bucket that
    lets short bursts through at full concurrency while holding the
    long-run average at ``requests_per_minute``.
    """

    def __init__(self, requests_per_minute: float, burst: int = 8) -> None:
        import threading
        import time as _time

        self.rate = requests_per_minute / 60.0
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.updated = _time.monotonic()
        self.lock = threading.Lock()

    def acquire(self) -> None:
        import time as _time

        while True:
            with self.lock:
                now = _time.monotonic()
                self.tokens = min(
                    self.capacity, self.tokens + (now - self.updated) * self.rate
                )
                self.updated = now
                if self.tokens >= 1.0:
                    self.tokens -= 1.0
                    return
                wait = (1.0 - self.tokens) / self.rate
            _time.sleep(min(wait, 1.0))


class OpenAIClient:
    """OpenAI-compatible HTTP client (reference ``models.py:10-52`` parity).

    Batch ``generate`` fans the prompt list over a bounded thread pool
    (the reference loops one blocking request at a time); each request
    retries on 429/5xx/connection errors with exponential backoff,
    honoring ``Retry-After``.  Completion prompts (``str`` or lazy
    ``CompletionPrompt`` — materialized via ``.text`` at request time) go
    to ``/completions``; chat transcripts (``list[(content, role)]``) go
    to ``/chat/completions``.  Tested against an in-process mock server
    (tests/test_openai_client.py); point ``base_url`` at any OpenAI-style
    endpoint (a vLLM/TGI server, or api.openai.com) in real deployments.
    """

    def __init__(
        self,
        base_url: str,
        api_key: str = "",
        model: str = "gpt-3.5-turbo",
        max_tokens: int = 250,  # reference models.py:18
        temperature: float = 0.0,
        requests_per_minute: float | None = None,
        max_concurrency: int = 8,
        max_retries: int = 5,
        timeout: float = 30.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.limiter = (
            RateLimiter(requests_per_minute) if requests_per_minute else None
        )
        self.max_concurrency = max_concurrency
        self.max_retries = max_retries
        self.timeout = timeout

    # -- single request ----------------------------------------------------

    def _post(self, path: str, payload: dict) -> dict:
        import json
        import time as _time
        import urllib.error
        import urllib.request

        body = json.dumps(payload).encode("utf-8")
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if self.limiter is not None:
                self.limiter.acquire()
            req = urllib.request.Request(
                f"{self.base_url}{path}",
                data=body,
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"Bearer {self.api_key}",
                },
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as err:
                last_err = err
                if err.code not in (429, 500, 502, 503, 504):
                    raise
                retry_after = err.headers.get("Retry-After")
                delay = (
                    float(retry_after)
                    if retry_after
                    else min(2.0**attempt * 0.1, 10.0)
                )
            except (urllib.error.URLError, TimeoutError) as err:
                last_err = err
                delay = min(2.0**attempt * 0.1, 10.0)
            _time.sleep(delay)
        raise RuntimeError(
            f"model endpoint failed after {self.max_retries + 1} attempts"
        ) from last_err

    def _one(self, prompt) -> str:
        text = getattr(prompt, "text", None)  # lazy CompletionPrompt
        if text is not None or isinstance(prompt, str):
            out = self._post(
                "/completions",
                {
                    "model": self.model,
                    "prompt": text if text is not None else prompt,
                    "max_tokens": self.max_tokens,
                    "temperature": self.temperature,
                },
            )
            return out["choices"][0]["text"]
        messages = [
            {"role": role, "content": content} for content, role in prompt
        ]
        out = self._post(
            "/chat/completions",
            {
                "model": self.model,
                "messages": messages,
                "max_tokens": self.max_tokens,
                "temperature": self.temperature,
            },
        )
        return out["choices"][0]["message"]["content"]

    def generate(self, prompts: list) -> list[str]:
        if len(prompts) <= 1:
            return [self._one(p) for p in prompts]
        from concurrent.futures import ThreadPoolExecutor

        workers = min(self.max_concurrency, len(prompts))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(self._one, prompts))


#: Reference ``models.py:72-86``: the manual 4-way layer split for a
#: 24-block T5-XL — blocks 0-5 / 6-11 / 12-17 / 18-23, one GPU each.
#: Expressed in the modern ``device_map`` form (the reference's
#: ``model.parallelize(device_map)`` API is the deprecated spelling of
#: the same placement).
SHARDED_DEVICE_MAP: dict[int, list[int]] = {
    gpu: list(range(gpu * 6, (gpu + 1) * 6)) for gpu in range(4)
}


def _default_hf_factory(
    model_name: str, max_new_tokens: int, device_map
):
    """Build the real transformers generate callable (import-gated: the
    sandbox ships no torch/transformers, so reaching this without the
    libraries raises an actionable ``NotImplementedError`` — pass
    ``factory=`` to inject a substitute, or use kind ``stub``/``openai``)."""
    try:
        from transformers import (  # type: ignore[import-not-found]
            AutoModelForSeq2SeqLM,
            AutoTokenizer,
        )
    except ImportError as ex:  # pragma: no cover — no torch in sandbox
        raise NotImplementedError(
            "HFLocalModel needs the transformers/torch stack, which this "
            "environment does not ship; inject factory=... (tests do) or "
            "use model kind 'stub' / 'openai'"
        ) from ex
    tok = AutoTokenizer.from_pretrained(model_name)
    if device_map is not None:
        model = AutoModelForSeq2SeqLM.from_pretrained(
            model_name, device_map=device_map
        )
    else:
        model = AutoModelForSeq2SeqLM.from_pretrained(model_name)
    model.eval()

    def generate_texts(texts: list[str]) -> list[str]:
        enc = tok(texts, return_tensors="pt", padding=True, truncation=True)
        ids = model.generate(
            **enc, max_new_tokens=max_new_tokens, do_sample=False
        )
        return tok.batch_decode(ids, skip_special_tokens=True)

    return generate_texts


class HFLocalModel:
    """Local HuggingFace seq2seq client (reference ``models.py:55-68``;
    the 4-GPU sharded variant mirrors ``models.py:71-105`` via
    ``SHARDED_DEVICE_MAP`` and the reference's 600-token cap).

    The actor-pool contract is the point: the (expensive) tokenizer +
    model build happens ONCE per detection actor in ``__init__`` via
    ``factory``, and ``generate`` only batches — chunks of
    ``batch_size`` prompts go through one forward pass each, prompts
    materialized at request time (lazy ``CompletionPrompt`` via
    ``.text``; chat transcripts flattened to role-tagged lines, the
    text-only spelling a seq2seq LM can consume).  ``factory`` is also
    the test seam: the sandbox has no torch, so tests inject a fake
    returning a ``generate_texts(list[str]) -> list[str]`` callable and
    pin the batching/materialization plumbing end to end
    (tests/test_hf_model.py); the default factory builds the real
    transformers stack.
    """

    def __init__(
        self,
        model_name: str = "google/flan-t5-base",
        max_new_tokens: int = 200,  # reference models.py:58
        batch_size: int = 16,
        device_map=None,
        factory=None,
    ) -> None:
        self.model_name = model_name
        self.max_new_tokens = max_new_tokens
        self.batch_size = max(1, int(batch_size))
        self.device_map = device_map
        self._generate_texts = (factory or _default_hf_factory)(
            model_name=model_name,
            max_new_tokens=max_new_tokens,
            device_map=device_map,
        )

    @staticmethod
    def _materialize(prompt) -> str:
        text = getattr(prompt, "text", None)  # lazy CompletionPrompt
        if text is not None:
            return text
        if isinstance(prompt, str):
            return prompt
        return "\n".join(f"{role}: {content}" for content, role in prompt)

    def generate(self, prompts: list) -> list[str]:
        texts = [self._materialize(p) for p in prompts]
        out: list[str] = []
        for i in range(0, len(texts), self.batch_size):
            out.extend(self._generate_texts(texts[i : i + self.batch_size]))
        return out


def make_model(kind: str = "stub", **kwargs) -> ModelClient:
    """Model factory used by the detection stage's actor ``__init__``."""
    if kind == "stub":
        from .synth import VOCAB

        vocab = kwargs.pop("vocab", None) or VOCAB
        return VocabStubModel(vocab, **kwargs)
    if kind == "openai":
        return OpenAIClient(**kwargs)
    if kind == "hf":
        return HFLocalModel(**kwargs)
    if kind == "hf_sharded":
        # reference models.py:88: the sharded checkpoints generate up to
        # 600 new tokens; placement defaults to the 4-way layer split
        kwargs.setdefault("max_new_tokens", 600)
        kwargs.setdefault("device_map", SHARDED_DEVICE_MAP)
        return HFLocalModel(**kwargs)
    raise ValueError(f"unknown model kind {kind!r}")
