SELECT * FROM {{ ref('fct_revenue') }}
