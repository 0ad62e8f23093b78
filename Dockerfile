# Container packaging for the Spark connector (reference ships the same
# shape: slim python base, install the sdist, console-script entrypoint —
# Dockerfile:1-11 semantics; here the engine needs a JRE for local-mode
# Spark, and config arrives via the R20 env-var surface, e.g.
# FALCON_API_ID / FALCON_API_SECRET / HUMIO_TOKEN / BULK_MAX_SIZE).
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

ENV PYTHONUNBUFFERED=1

COPY pyproject.toml README.md ./
COPY cses2humio_spark ./cses2humio_spark

# Installs the pinned runtime deps INCLUDING protobuf — the
# transformWithStateInPandas state-server protocol needs it, and the
# build sandbox image lacks it (its two tests importorskip there; an
# image built from THIS file runs them). No network in the sandbox and
# pip installs are disallowed, so the pin lives here and in
# pyproject.toml rather than being vendored into the tree.
RUN pip3 install --no-cache-dir .

ENTRYPOINT [ "cses2humio-spark" ]
