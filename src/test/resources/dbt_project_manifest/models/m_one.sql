SELECT 1 AS x FROM {{ ref('m_two') }}
