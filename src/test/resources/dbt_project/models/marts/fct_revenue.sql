{{ config(materialized='incremental', schema='analytics') }}
WITH base AS (
  SELECT o.o_orderkey, o.o_totalprice, c.c_name
  FROM {{ ref('stg_orders') }} o
  JOIN {{ ref('stg_customers') }} c ON o.o_custkey = c.c_custkey
)
SELECT c_name, sum(o_totalprice) AS revenue FROM base GROUP BY c_name
