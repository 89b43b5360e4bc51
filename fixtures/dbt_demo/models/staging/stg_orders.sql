{{ config(materialized='table') }}
SELECT o_orderkey, o_custkey, o_totalprice
FROM {{ source('raw', 'orders') }}
WHERE o_totalprice > 0
